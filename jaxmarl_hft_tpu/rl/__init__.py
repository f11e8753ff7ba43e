from .distributions import (Categorical, MultiCategorical,
                            AutoregressiveMultiCategorical)
from .networks import ScannedRNN, ActorCriticRNN
from .ippo import make_train, default_train_config, Transition
from .baselines import (RandomPolicy, FixedActionPolicy, LearnedPolicy,
                        rollout, evaluate_combinations)
