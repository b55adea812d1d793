from . import (  # noqa: F401
    copurchase,
    dedup,
    evaluate,
    hybrid,
    multimodal,
    resolve,
    sampling,
    similarity,
    textops,
)
