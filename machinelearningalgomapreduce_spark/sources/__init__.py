from machinelearningalgomapreduce_spark.sources.catalog import TABLES, load_table, load_tables  # noqa: F401
from machinelearningalgomapreduce_spark.sources.schemas import SCHEMAS  # noqa: F401
