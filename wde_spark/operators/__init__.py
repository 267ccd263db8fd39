from . import relational, textstats, dedup, similarity, resolve  # noqa: F401
