from .chain import (  # noqa: F401
    ANALYZERS,
    CLEAN_TWITTER,
    CODE,
    DEFAULT,
    SIMPLE_CODE,
    Analyzer,
    get_analyzer,
)
from .porter2 import stem  # noqa: F401
from .stopwords import STOPWORDS, remove_stopwords  # noqa: F401
from .twokenizer import twokenize  # noqa: F401
