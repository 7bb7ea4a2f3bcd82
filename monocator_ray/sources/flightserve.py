"""Arrow Flight serving surface (S3 companion, the network sibling of the
DuckDB export): expose registry query results over the Arrow ecosystem's
standard RPC so any Flight-speaking client (pyarrow, ADBC drivers,
Arrow-JS, DataFusion) can pull them as record-batch streams with zero
re-serialization — the serving hand-off for results a downstream system
wants LIVE rather than as files.

Design:

* ``QueryFlightServer`` wraps the query registry: ``list_flights``
  enumerates query names with schemas-on-demand, ``get_flight_info``
  describes one, ``do_get(ticket=<name>)`` RUNS the Ray pipeline and
  streams its Arrow result.  Results are cached per name after the first
  pull (the registry's pipelines are deterministic over a fixed sf_dir),
  so repeated clients cost one pipeline run.
* Results are QUERY OUTPUTS — aggregates, top-ks, reports — i.e. the
  O(groups)-bounded tables this engine already collects driver-side for
  its oracle comparisons; the fact tables themselves stay in parquet and
  are NOT served (a ticket for an unknown name errors).  That keeps the
  server's memory bounded by the same written contracts the collect
  sites carry.
* Localhost-only by default (``grpc://127.0.0.1:<port>``) — the sandbox
  has no outbound network, and a deployment should front this with its
  own authn (Flight middleware hooks exist for that).

The CLI entry is ``python -m monocator_ray serve-flight --sf-dir ...``;
tests drive a server on an ephemeral port with a pyarrow FlightClient in
the same process group (the local-server discipline of the HTTP/TLS/DNS
suites).
"""

from __future__ import annotations

import threading

import pyarrow as pa
import pyarrow.flight as flight


def _as_table(result) -> pa.Table:
    """Registry callables return Dataset | pandas | Arrow — normalize."""
    import pandas as pd

    import ray.data as rd

    if isinstance(result, pa.Table):
        return result
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result, preserve_index=False)
    if isinstance(result, rd.Dataset):
        from monocator_ray.stages.grouped import collect_arrow

        return collect_arrow(result)  # bounded: registry results are O(groups)/top-k tables
    raise TypeError(f"cannot serve result of type {type(result)!r}")


class QueryFlightServer(flight.FlightServerBase):
    """Flight endpoint over the query registry (see module docstring)."""

    def __init__(self, sf_dir: str, location: str = "grpc://127.0.0.1:0",
                 names: list[str] | None = None):
        super().__init__(location)
        from monocator_ray.pipelines.registry import REGISTRY

        self._sf_dir = sf_dir
        self._queries = {
            n: fn for n, (fn, *_rest) in REGISTRY.items()
            if names is None or n in names
        }
        self._cache: dict[str, pa.Table] = {}
        self._lock = threading.Lock()

    # ---- helpers ----
    def _run(self, name: str) -> pa.Table:
        if name not in self._queries:
            raise flight.FlightServerError(f"unknown query {name!r}")
        with self._lock:  # one pipeline at a time; repeat pulls hit cache
            if name not in self._cache:
                self._cache[name] = _as_table(self._queries[name](self._sf_dir))
            return self._cache[name]

    @property
    def endpoint(self) -> str:
        return f"grpc://127.0.0.1:{self.port}"

    # ---- Flight protocol ----
    def list_flights(self, context, criteria):
        for name in sorted(self._queries):
            desc = flight.FlightDescriptor.for_path(name.encode())
            yield flight.FlightInfo(
                pa.schema([]), desc,
                [flight.FlightEndpoint(name.encode(), [self.endpoint])],
                -1, -1)

    def get_flight_info(self, context, descriptor):
        name = descriptor.path[0].decode()
        t = self._run(name)
        return flight.FlightInfo(
            t.schema, descriptor,
            [flight.FlightEndpoint(name.encode(), [self.endpoint])],
            t.num_rows, t.nbytes)

    def do_get(self, context, ticket):
        t = self._run(ticket.ticket.decode())
        return flight.RecordBatchStream(t)


def serve_flight(sf_dir: str, port: int = 0,
                 names: list[str] | None = None) -> QueryFlightServer:
    """Start (and return) a serving instance bound to 127.0.0.1:port —
    callers use ``.endpoint`` / ``.port`` and ``.shutdown()``."""
    return QueryFlightServer(sf_dir, f"grpc://127.0.0.1:{port}", names=names)
