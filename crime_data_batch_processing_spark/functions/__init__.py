"""Scalar / array / map / JSON function-library operators.

Importing this package registers the function-library queries
(SURVEY.md §2.3 P26–P31) into the engine registry.
"""

from crime_data_batch_processing_spark.functions import exact  # noqa: F401

# Query-registering modules (populated in later stages) are imported
# here so `registry.load_all_operators()` sees them.
from crime_data_batch_processing_spark.functions import scalar_funcs  # noqa: F401
from crime_data_batch_processing_spark.functions import collection_funcs  # noqa: F401
