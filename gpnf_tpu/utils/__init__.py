from .options import opt_get, parse_options, NoneDict, dict2str
from .timer import Timer, TickTock, ScopeTimer

__all__ = ["opt_get", "parse_options", "NoneDict", "dict2str", "Timer",
           "TickTock", "ScopeTimer"]
