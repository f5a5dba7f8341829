"""TiKV RawKV connector boundary (stub).

A real deployment would read live clusters the way the reference does
(rawkv client Scan/Checksum RPCs, region-aligned parallelism — reference
scan/scan.go:44-60, checksum/checksum.go:52-65).  The client library
(`tikv-client` / a JVM DataSource V2) is not available in this environment,
so this module documents the connector contract and fails loudly.

Design (for when the dependency exists):
- DataSource V2 with one ``InputPartition`` per region (the Spark analogue
  of PaginateScanRegion, checksum/checksum.go:52-57) so scans are
  region-aligned and data-local.
- ``SupportsPushDownFilters`` for the key-range predicate (the range rides
  into the Scan RPC exactly as in the reference).
- ``SupportsPushDownAggregates`` optionally maps the checksum triple onto
  TiKV's coprocessor checksum (checksum/checksum.go:83) so only 24 bytes per
  region cross the network.
- APIv2 key codec (codec.encode_key_v2/decode_key_v2) applied at the
  boundary; API-version fetch (utils/utils.go:13-26) becomes the source's
  schema/metadata handshake, enforced by model.check_comparable.
"""

from __future__ import annotations

from tikv_data_compare_spark.model import Keyed


def load_tikv(spark, pd_addr: str, start=None, end=None, api_version: str = "V2") -> Keyed:
    """Open a RawKV cluster as a keyed DataFrame.  Not available here."""
    try:
        import tikv_client  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "TiKV connector requires the tikv-client package (not bundled in "
            "this environment); use sources.parquet for file-backed sources, "
            "or export the cluster with the reference's scan command and open "
            "the dump with sources.scandump.load_scan_dump (reads the "
            "{NAME}_scan.log.<ts> format with range pushdown)"
        ) from e
    raise NotImplementedError("DataSource V2 TiKV connector: see module docstring for the design")
