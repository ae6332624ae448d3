"""PySpark-native analytics engine with the query and data-processing
capabilities of aws-samples/dicom-metadata-extractor-serverless-datalake.

The reference is a serverless ingest-ETL (S3 event -> Lambda/Batch ->
pydicom metadata flatten -> partitioned Parquet -> Glue/Athena SQL).
This package re-expresses that dataflow Spark-first:

- ``sources``   : binary / parquet / csv / json readers, ranged binary scan
- ``dicom``     : pure-Python DICOM codec + VR type system (public PS3.5/3.6/3.10)
- ``ingest``    : binaryFile -> archive explode -> typed flatten -> Parquet lake
- ``operators`` : as-of join, top-k, dedup (exact/MinHash/SimHash), similarity
                  search, text analysis, multimodal column plumbing
- ``queries``   : the t2 correctness corpus (Spark callable + DuckDB oracle SQL)
- ``streaming`` : Structured Streaming ingest + windowed aggregations
"""

__version__ = "0.1.0"

from .api import DicomLake  # noqa: F401,E402
from .cloud import cloud_conf, cloud_session  # noqa: F401,E402
from .pipeline import TextCorpus  # noqa: F401,E402
from .vectors import EmbeddingSet  # noqa: F401,E402
from .eventlog import EventLog  # noqa: F401,E402
