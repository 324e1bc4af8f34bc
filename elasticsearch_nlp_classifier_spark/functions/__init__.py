from .filters import *  # noqa: F401,F403
from .query_string import (  # noqa: F401
    QueryStringError,
    compile_query_string,
    compile_simple_query_string,
    compile_wrapper_query,
)
