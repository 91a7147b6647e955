"""Large-scale training-data pipeline operations over document /
embedding tables: deduplication (exact, MinHash+LSH, SimHash, n-gram
Jaccard), similarity search (brute-force cosine top-k, LSH-bucketed
ANN), text analysis (token stats, quality, language-ID,
fingerprinting), and multimodal column plumbing.

These extend the log-pipeline operator set with the operations a
100 TB pretraining-data pipeline needs; all are expressed as
DataFrame transformations with explicit shuffle story documented per
function.
"""

from ilogtail_spark.dataops import dedup as dedup  # noqa: F401
from ilogtail_spark.dataops import similarity as similarity  # noqa: F401
from ilogtail_spark.dataops import textstats as textstats  # noqa: F401
from ilogtail_spark.dataops import multimodal as multimodal  # noqa: F401
