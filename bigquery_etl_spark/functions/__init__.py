from bigquery_etl_spark.functions.text import (
    bpe_ish_tokens,
    doc_fingerprint,
    lang_id_score,
    quality_features,
)

__all__ = ["bpe_ish_tokens", "doc_fingerprint", "lang_id_score", "quality_features"]
