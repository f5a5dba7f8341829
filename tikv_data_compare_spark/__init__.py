"""tikv_data_compare_spark — a PySpark-native data-comparison / analytics engine.

Re-expresses the capabilities of the reference CLI ``haojinming/tikv-data-compare``
(a TiKV RawKV consistency checker: checksum / scan / diff / key codecs) as a
Spark-first library, generalized from the reference's fixed
``key: binary -> value: binary`` data model (reference scan/scan.go:45,
diff/diff.go:49) to any *keyed DataFrame* (key columns + value columns), and
extended with the LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB training-data pipeline needs.

Design rules (see SURVEY.md §4, §7):
- DataFrame/SQL only; Catalyst plans the physical strategy.  No RDDs in the
  hot path; Pandas UDFs only where built-ins can't express the semantics
  (crc64 compat mode, multimodal decode).
- Every operator is shuffle-conscious: aggregations rely on partial/final
  hash aggregation (the reference's per-region merge, checksum/checksum.go:25-29,
  for free), diffs are key-partitioned joins, exports use range partitioning.
"""

from tikv_data_compare_spark.session import get_spark
from tikv_data_compare_spark.model import Keyed, check_comparable, schema_diff
from tikv_data_compare_spark.operators.checksum import checksum, compare_checksum
from tikv_data_compare_spark.operators.curate import curate
from tikv_data_compare_spark.operators.diff import (
    diff,
    only_in_dst,
    only_in_src,
    repair_plan,
    targeted_diff,
)
from tikv_data_compare_spark.operators.scan import range_scan, export_hex
from tikv_data_compare_spark.sources.scandump import load_scan_dump
from tikv_data_compare_spark.sources.meta import check_handshake, read_meta
from tikv_data_compare_spark.sources.tikv import load_tikv

__all__ = [
    "get_spark",
    "Keyed",
    "check_comparable",
    "schema_diff",
    "checksum",
    "compare_checksum",
    "curate",
    "diff",
    "only_in_src",
    "only_in_dst",
    "repair_plan",
    "targeted_diff",
    "range_scan",
    "export_hex",
    "load_scan_dump",
    "load_tikv",
    "read_meta",
    "check_handshake",
]

__version__ = "0.1.0"
