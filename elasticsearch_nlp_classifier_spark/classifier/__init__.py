from .nb import (  # noqa: F401
    NBModel,
    accuracy,
    enrich,
    kfold_validation,
    multi_enrich,
    predict_nb,
    train_nb,
)
from .linear import (  # noqa: F401
    LinearModel,
    hashed_features,
    predict_linear,
    train_maxent,
    train_maxent_qn,
    train_perceptron,
)
from .oracle import predict_oracle, train_oracle  # noqa: F401
