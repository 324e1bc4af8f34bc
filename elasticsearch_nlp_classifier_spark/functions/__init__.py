from .filters import *  # noqa: F401,F403
from .jsonpath import (  # noqa: F401
    es_json_path,
    json_path_col,
    json_path_select,
)
from .query_string import (  # noqa: F401
    QueryStringError,
    compile_query_string,
    compile_simple_query_string,
    compile_wrapper_query,
)
