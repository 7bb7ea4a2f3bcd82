"""Arrow Flight serving (sources/flightserve.py): an in-process server on
an ephemeral localhost port, driven by a pyarrow FlightClient — list,
describe, fetch, unknown-ticket error, and cache behavior."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.flight as flight
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def server(ray_session):
    from monocator_ray.sources.flightserve import serve_flight

    srv = serve_flight(SF, names=["pricing_summary", "event_stats"])
    yield srv
    srv.shutdown()


def test_list_and_fetch_matches_direct_run(server, ray_session):
    client = flight.connect(server.endpoint)
    names = sorted(
        fi.descriptor.path[0].decode() for fi in client.list_flights())
    assert names == ["event_stats", "pricing_summary"]

    info = client.get_flight_info(
        flight.FlightDescriptor.for_path(b"pricing_summary"))
    assert info.total_records > 0

    got = client.do_get(flight.Ticket(b"pricing_summary")).read_all()
    from monocator_ray.pipelines.registry import REGISTRY
    from monocator_ray.sources.flightserve import _as_table

    want = _as_table(REGISTRY["pricing_summary"][0](SF))
    assert got.equals(want)


def test_unknown_ticket_errors(server):
    client = flight.connect(server.endpoint)
    with pytest.raises(flight.FlightError):
        client.do_get(flight.Ticket(b"no_such_query")).read_all()


def test_repeat_pull_serves_from_cache(server):
    client = flight.connect(server.endpoint)
    a = client.do_get(flight.Ticket(b"event_stats")).read_all()
    assert "event_stats" in server._cache
    # poison the cache to PROVE the second pull doesn't recompute
    marker = pa.table({"marker": pa.array([1], pa.int64())})
    server._cache["event_stats"] = marker
    b = client.do_get(flight.Ticket(b"event_stats")).read_all()
    assert b.equals(marker)
    server._cache["event_stats"] = a  # restore
