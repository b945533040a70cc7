from ub_etl_spark.functions.exact import DEC, davg, dmul, dsum, to_dec

__all__ = ["DEC", "davg", "dmul", "dsum", "to_dec"]
