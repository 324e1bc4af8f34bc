from .jobspec import (  # noqa: F401
    DatasetSpec,
    PipelineSpec,
    SpecError,
    TaskSpec,
    load_pipeline,
    run_pipeline,
)
