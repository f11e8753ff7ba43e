from . import spaces
from .structs import (LoadedEnvState, WorldState, MultiAgentState,
                      MMEnvState, ExecEnvState, LoadedEnvParams,
                      MultiAgentParams, MMEnvParams, ExecEnvParams)
from .world import WorldEnv
from .mm import MarketMakingAgent
from .execution import ExecutionAgent
from .marl import MarlEnv
