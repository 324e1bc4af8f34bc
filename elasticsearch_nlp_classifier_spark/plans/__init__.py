from .dataprep import run_dataprep  # noqa: F401
from .jobspec import (  # noqa: F401
    DatasetSpec,
    PipelineSpec,
    SpecError,
    TaskSpec,
    load_pipeline,
    run_pipeline,
)
