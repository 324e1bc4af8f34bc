from .filters import *  # noqa: F401,F403
from .query_string import QueryStringError, compile_query_string  # noqa: F401
