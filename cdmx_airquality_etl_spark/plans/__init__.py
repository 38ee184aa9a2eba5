from .merge import collapse_to_key_grain, merge_into_parquet, merge_upsert

__all__ = ["collapse_to_key_grain", "merge_into_parquet", "merge_upsert"]
