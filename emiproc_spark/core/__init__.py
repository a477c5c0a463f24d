from emiproc_spark.core.inventory import Inventory  # noqa: F401
