from . import amazon_meta  # noqa: F401
