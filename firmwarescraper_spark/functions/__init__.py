from firmwarescraper_spark.functions.url import (  # noqa: F401
    canonicalize_url,
    canonicalize_url_udf,
    url_host,
    url_host_udf,
    url_join,
    url_join_udf,
    url_hash_col,
)
