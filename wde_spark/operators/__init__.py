from . import relational, textstats, dedup, similarity, resolve, layout  # noqa: F401
