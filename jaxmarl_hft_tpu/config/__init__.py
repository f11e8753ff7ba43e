from . import constants
from .structs import (LobConfig, WorldConfig, MMConfig, ExecConfig,
                      MultiAgentConfig, AGENT_CONFIG_CLASSES, replace_cfg)
from .io import (load_config, save_config, config_from_dict, config_to_dict,
                 make_agent_configs)
