"""Byte-parity against the reference's own golden reports.

Feeds the reference's fixture battle logs
(stats/src/test/testdata/logs/**) through the production engine
(parse_battles → sides/mons frames → usage/leads/battle_counts
aggregates) with a curated real-gen-data payload, renders the LEGACY
usage and leads reports, and compares byte-for-byte against the
reference's checked-in goldens (stats/src/test/testdata/reports/**) —
the check integration.test.ts runs on the TypeScript side."""

import os

import pytest

from stats_spark.parity import fixtures, run

pytestmark = pytest.mark.skipif(
    not os.path.exists(fixtures.LOGS),
    reason="reference fixture logs not available")

CUTOFFS = [0, 1500, 1630, 1760]


@pytest.fixture(scope="module", params=fixtures.formats())
def fmt_frames(request, spark):
    fmt = request.param
    frames = run.build_format_frames(spark, fmt)
    run.add_metagame_frames(spark, fmt, frames)
    return fmt, frames


def test_no_parse_rejects(fmt_frames):
    fmt, frames = fmt_frames
    errs = frames["battles"].filter("error IS NOT NULL").collect()
    assert not errs, [(r.conv_id, r.error) for r in errs]


@pytest.mark.parametrize("cutoff", CUTOFFS)
def test_usage_byte_parity(fmt_frames, cutoff):
    fmt, frames = fmt_frames
    got = run.render_usage(fmt, cutoff, frames)
    want = fixtures.golden(fmt, "usage", cutoff)
    assert got == want


@pytest.mark.parametrize("cutoff", CUTOFFS)
def test_leads_byte_parity(fmt_frames, cutoff):
    fmt, frames = fmt_frames
    got = run.render_leads(fmt, cutoff, frames)
    want = fixtures.golden(fmt, "leads", cutoff)
    assert got == want


@pytest.mark.parametrize("cutoff", CUTOFFS)
def test_metagame_byte_parity(fmt_frames, cutoff):
    """Exercises the full legacy classifier (stalliness modifiers,
    weather/style tags, monotype) + the stalliness histogram."""
    fmt, frames = fmt_frames
    got = run.render_metagame(fmt, cutoff, frames)
    want = fixtures.golden(fmt, "metagame", cutoff)
    assert got == want
