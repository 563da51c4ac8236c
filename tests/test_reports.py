"""Report shaping + rendering tests: structural rules + committed
snapshot goldens (regenerate with scripts/make_goldens.py)."""

import os

import pytest

from stats_spark.plans import pipeline, reports

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def frames(spark, t1):
    from stats_spark.operators.parse import parse_battles
    from stats_spark.sources import tables
    battles = parse_battles(tables.load_transcripts(spark, t1),
                            tables.load_conversations(spark, t1))
    return pipeline.build_frames(spark, battles)


def test_usage_report_rows(frames):
    pdf = reports.usage_report_rows(
        frames["usage"], frames["usage_totals"]).toPandas()
    g = pdf[(pdf.format == "gen9ou") & (pdf.cutoff == 0)].sort_values("rank")
    assert list(g["rank"]) == list(range(1, len(g) + 1))
    # ranked by weighted desc
    w = list(g.usage_pct)
    assert all(a >= b for a, b in zip(w, w[1:]))
    # ×6 scaling: percentages sum to ~600 across the format
    assert abs(g.usage_pct.sum() - 600) < 1.0


def test_checks_counters_scoring(frames):
    pdf = reports.checks_counters_rows(frames["encounters"],
                                       min_n=2.0).toPandas()
    assert (pdf.n > 2).all()
    # p-4d identity holds
    assert ((pdf.score - (pdf.p - 4 * pdf.d)).abs() < 1e-9).all()
    for _, grp in pdf.groupby(["format", "cutoff", "species"]):
        s = list(grp.sort_values("rn").score)
        assert all(a >= b for a, b in zip(s, s[1:]))


def test_moveset_sections_order(frames):
    pdf = reports.moveset_section_rows(
        frames["moveset"], frames["usage"]).toPandas()
    grp = pdf[(pdf.format == "gen9ou") & (pdf.cutoff == 1500)
              & (pdf.section == "moves")]
    for _, g in grp.groupby("species"):
        g = g.sort_values("rn")
        sh = list(g.share)
        assert all(a >= b - 1e-12 for a, b in zip(sh, sh[1:]))
        cum = list(g.cum_before)
        assert cum[0] == 0.0
        assert all(b >= a - 1e-12 for a, b in zip(cum, cum[1:]))


def test_stalliness_histogram_bins():
    samples = [(-1.5, 1.0), (-0.2, 2.0), (0.1, 3.0), (0.9, 1.0), (2.2, 0.5)]
    hist, bin_size, mean, total = reports.stalliness_histogram(samples)
    assert total == 7.5
    # the reference drops samples past the last bin (util.ts:391-396);
    # everything except the 2.2 tail sample must be binned
    binned = sum(w for _, w in hist)
    assert 7.0 - 1e-9 <= binned <= total
    xs = [x for x, _ in hist]
    assert xs == sorted(xs)
    assert any(x == 0.0 for x in xs)


def test_report_snapshots(spark, frames, tmp_path):
    out = str(tmp_path / "reports")
    reports.write_reports(spark, frames, out)
    for rel in ["gen9ou-1500.txt", "leads/gen9ou-1500.txt",
                "metagame/gen9ou-1500.txt"]:
        got = open(os.path.join(out, rel)).read()
        golden_path = os.path.join(GOLDEN_DIR, rel.replace("/", "__"))
        assert os.path.exists(golden_path), \
            f"golden missing — run scripts/make_goldens.py ({golden_path})"
        assert got == open(golden_path).read(), f"snapshot drift: {rel}"


def test_moveset_render(frames):
    sec = reports.moveset_section_rows(frames["moveset"], frames["usage"])
    tm = reports.teammates_rows(frames["teammates"], frames["usage"])
    cc = reports.checks_counters_rows(frames["encounters"], min_n=2.0)
    f, c = "gen9ou", 1500
    sec_p = sec.filter(f"format='{f}' and cutoff={c}").toPandas()
    species = sec_p.species.iloc[0]
    sections = {s: g.sort_values("rn").to_dict("records")
                for s, g in sec_p[sec_p.species == species].groupby("section")}
    tm_p = (tm.filter(f"format='{f}' and cutoff={c} and species='{species}'")
            .toPandas().sort_values("rn").to_dict("records"))
    cc_p = (cc.filter(f"format='{f}' and cutoff={c} and species='{species}'")
            .toPandas().sort_values("rn").to_dict("records"))
    txt = reports.render_moveset_sections(
        species, 10, 0.5, 77, sections, tm_p, cc_p)
    assert f"| {species}" in txt
    assert "| Abilities" in txt and "| Teammates" in txt
    for line in txt.splitlines():
        assert len(line) in (42,) or line.startswith("|\t"), repr(line)
