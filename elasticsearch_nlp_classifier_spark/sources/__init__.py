from .corpus_source import read_corpus  # noqa: F401
from .csv_io import (  # noqa: F401
    TWEETS_SCHEMA,
    read_tweets_csv,
    write_submission_csv,
)
from .model_io import (  # noqa: F401
    load_linear_model,
    load_model,
    save_linear_model,
    save_model,
)
from .merge import (  # noqa: F401
    delete_by_query,
    iceberg_merge_sql,
    merge_updates,
    merge_updates_iceberg,
    update_by_query,
)
from .ingest import (  # noqa: F401
    apply_ingest_pipeline,
    compile_ingest_pipeline,
    simulate_ingest_pipeline,
)
