"""Live-cluster adapter: public ``tikv-client`` package → the 3-method
client contract of sources/tikv.py.

The reference connects through tikv/client-go (rawkv.NewClientWithOpts,
/root/reference/diff/diff.go:19-31) and fetches cluster metadata from PD
(utils/utils.go:13-26).  This adapter does the same from Python using only
public surfaces:

- ``scan``              → ``tikv_client.RawClient.scan`` (the PyPI
                          ``tikv-client`` package, Rust client bindings);
- ``api_version``       → PD's HTTP config endpoint
                          (``/pd/api/v1/config`` → ``storage.api-version``),
                          parsed by :func:`tikv_wire.parse_api_version` —
                          the same JSON shape the golden fixtures pin;
- ``region_boundaries`` → PD's HTTP region endpoint (``/pd/api/v1/regions``
                          start keys, hex-encoded), giving the same
                          region→sub-range planning input as the
                          reference's PaginateScanRegion
                          (checksum/checksum.go:52-65).

The adapter is env-gated by package availability only: ``_make_client`` in
sources/tikv.py returns it on the ``client="live"`` path when
``tikv_client`` imports.  Its contract behavior (pagination, planning,
handshake) is unit-tested against an injected fake of the tikv_client API
(tests/test_tikv.py); the byte-level wire shapes live in
tests/test_tikv_wire.py.
"""

from __future__ import annotations

import json
import urllib.request

from tikv_data_compare_spark.sources.tikv_wire import parse_api_version


def _http_get(url: str, timeout: float = 10.0) -> bytes:
    with urllib.request.urlopen(url, timeout=timeout) as r:  # noqa: S310 — PD endpoint from user config
        return r.read()


class LiveTikvClient:
    """3-method client over a live cluster.  ``options`` are the reader
    options of the ``tikv_raw`` DataSource; ``pd_addr`` is required
    (comma-separated PD endpoints, the reference's --src-pd/--dst-pd form,
    config/config.go:10-18)."""

    def __init__(self, options: dict):
        pd_addr = options.get("pd_addr")
        if not pd_addr:
            raise ValueError(
                "live TiKV client needs a pd_addr option (tikv://<pd-endpoints> "
                "in the CLI, comma-separated like the reference's --src-pd)"
            )
        from tikv_client import RawClient  # env-gated import, checked by caller

        self._endpoints = [e.strip() for e in pd_addr.split(",") if e.strip()]
        self._raw = RawClient.connect(self._endpoints)
        self._api: str | None = None

    def _pd_http(self, path: str) -> bytes:
        last_err: Exception | None = None
        for ep in self._endpoints:
            base = ep if "://" in ep else f"http://{ep}"
            try:
                return _http_get(f"{base}{path}")
            except Exception as e:  # noqa: BLE001 — try the next PD endpoint
                last_err = e
        raise ConnectionError(f"no PD endpoint answered {path}: {last_err}")

    def api_version(self) -> str:
        if self._api is None:
            self._api = parse_api_version(self._pd_http("/pd/api/v1/config"))
        return self._api

    def region_boundaries(self) -> list[bytes]:
        data = json.loads(self._pd_http("/pd/api/v1/regions"))
        keys = {
            r["start_key"]
            for r in data.get("regions") or []
            if r.get("start_key")  # the first region's empty start is -inf, not a split
        }
        return sorted(bytes.fromhex(k) for k in keys)

    def scan(self, start: bytes | None, end: bytes | None, limit: int):
        pairs = self._raw.scan(start or b"", end, limit)
        return [(bytes(k), bytes(v)) for k, v in pairs]
