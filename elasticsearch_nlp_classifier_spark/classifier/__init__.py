from .nb import (  # noqa: F401
    NBModel,
    accuracy,
    enrich,
    kfold_validation,
    multi_enrich,
    predict_nb,
    train_nb,
)
from .oracle import predict_oracle, train_oracle  # noqa: F401
