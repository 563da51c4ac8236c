"""Deterministic synthetic transcript corpus.

Generates the two input tables of FIXTURES.md (§1 `transcripts`, §2
`conversations`) at three tiers (t1 smoke / t2 correctness / bench).
The protocol-line grammar mirrors the reference's stored battle logs
(`/root/reference/stats/src/parser.ts:7-28, 135-272`):

    |player|p1|<name>      |teamsize|p1|6        |start
    |switch|p1a: <ident>|<Species>, L<lvl>|100/100
    |turn|N
    |move|p1a: <ident>|<Move>|p2a: <ident>
    |faint|p2a: <ident>
    |drag|p2a: <ident>|<Species>, L<lvl>|93/100
    |-enditem|p2a: <ident>|Red Card
    |win|<player>   or   |tie

Determinism: every conversation is generated from
``SeedSequence([seed, conv_idx])`` only, so generation parallelizes
(Spark ``mapInPandas`` over index ranges) with results identical to the
serial path — the property the DuckDB oracle and the golden tests rely
on.

Skew: format sizes follow dims.FORMATS weights (orders of magnitude
apart, per the reference's heterogeneity warning
``logs/DESIGN.md:9-11``) so downstream groupBys exercise AQE skew
handling.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from stats_spark.datagen import dims

BASE_TS = datetime(2026, 3, 1, tzinfo=timezone.utc)

TIERS = {"t1": 60, "t2": 5000, "bench": 200_000}

EV_PRESETS = [
    {"hp": 252, "atk": 252, "def": 0, "spa": 0, "spd": 4, "spe": 0},
    {"hp": 0, "atk": 252, "def": 0, "spa": 0, "spd": 4, "spe": 252},
    {"hp": 0, "atk": 0, "def": 0, "spa": 252, "spd": 4, "spe": 252},
    {"hp": 252, "atk": 0, "def": 252, "spa": 0, "spd": 4, "spe": 0},
    {"hp": 252, "atk": 0, "def": 4, "spa": 0, "spd": 252, "spe": 0},
    {"hp": 248, "atk": 0, "def": 8, "spa": 252, "spd": 0, "spe": 0},
]

_FMT_NAMES = [f for f, *_ in dims.FORMATS]
_FMT_W = np.array([w for _, w, *_ in dims.FORMATS])
_FMT_W = _FMT_W / _FMT_W.sum()

CORRUPT_RATE = 0.004  # fraction of convs with an injected malformed line


def _species_pool(fmt: str) -> list[str]:
    """Per-format species pool (rotated slice) so usage distributions
    differ per format — the reference's per-format reports differ the
    same way."""
    sp = dims.species_table().species_id.tolist()
    base = [s for s in sp if not s.endswith("mega")]
    # zlib.crc32, not hash(): Python's str hash is salted per process and
    # would break cross-process generation determinism.
    import zlib
    off = (zlib.crc32(fmt.encode()) % 7) * 5 % len(base)
    rot = base[off:] + base[:off]
    return rot[:40]


def _zipf_choice(rng: np.random.Generator, pool: list[str], k: int) -> list[str]:
    ranks = np.arange(1, len(pool) + 1, dtype=np.float64)
    w = 1.0 / ranks ** 1.1
    w /= w.sum()
    idx = rng.choice(len(pool), size=k, replace=False, p=w)
    return [pool[i] for i in idx]


def _gen_set(rng: np.random.Generator, species: str, fmt_gen: int) -> dict:
    moves_pool = dims.moves_table().move_id.tolist()
    n_moves = 4
    mi = rng.choice(len(moves_pool), size=n_moves, replace=False)
    moves = [moves_pool[i] for i in mi]
    items = dims.items_table().item_id.tolist()
    item = items[int(rng.integers(len(items)))]
    mega = dims.mega_dict()
    if (species, item) not in mega and rng.random() < 0.9:
        # bias away from mismatched mega stones
        non_stone = [i for i in items if not i.endswith("ite")]
        item = non_stone[int(rng.integers(len(non_stone)))]
    evs = dict(EV_PRESETS[int(rng.integers(len(EV_PRESETS)))])
    ivs = {k: 31 for k in dims.STAT_KEYS}
    if rng.random() < 0.15:
        ivs["atk"] = 0
    natures = list(dims.NATURES)
    return dict(
        species=species,
        item=item,
        ability=dims.ABILITIES[int(rng.integers(len(dims.ABILITIES) - 1))],
        nature=natures[int(rng.integers(len(natures)))],
        moves=moves,
        evs=evs,
        ivs=ivs,
        level=100 if rng.random() < 0.9 else 50,
        happiness=255 if rng.random() < 0.92 else int(rng.integers(0, 256)),
        tera_type=(dims.TYPES[int(rng.integers(len(dims.TYPES)))]
                   if fmt_gen >= 9 and rng.random() < 0.7 else None),
    )


def gen_conversation(conv_idx: int, n_convs: int, seed: int = dims.SEED):
    """Generate one conversation: returns (meta_row: dict, lines: list[dict]).

    Pure function of (conv_idx, n_convs, seed).
    """
    rng = np.random.default_rng(np.random.SeedSequence([seed, conv_idx]))
    fmt_i = int(rng.choice(len(_FMT_NAMES), p=_FMT_W))
    fmt, _, gen, singles, is6v6 = dims.FORMATS[fmt_i]
    conv_id = f"battle-{fmt}-{conv_idx}"

    pool_sz = max(50, n_convs // 3)
    p1_id, p2_id = rng.choice(pool_sz, size=2, replace=False)
    p1, p2 = f"player{p1_id}", f"player{p2_id}"

    def rating(outcome_bias: float):
        if rng.random() < 0.8:
            return (float(np.clip(rng.normal(1500 + outcome_bias, 180), 1000, 2200)),
                    float(rng.uniform(25, 150)))
        return (None, None)

    team_n = 6 if is6v6 else 3
    pool = _species_pool(fmt)
    sp_disp = dict(zip(dims.species_table().species_id,
                       dims.species_table().display_name))
    mv_disp = dict(zip(dims.moves_table().move_id,
                       dims.moves_table().display_name))

    teams = []
    for _side in range(2):
        species = _zipf_choice(rng, pool, team_n)
        teams.append([_gen_set(rng, s, gen) for s in species])

    corrupt = rng.random() < CORRUPT_RATE

    # ---- simulate the battle ------------------------------------------
    start_ts = BASE_TS + timedelta(seconds=int(conv_idx) * 7)
    lines: list[tuple[str, str | None, str]] = []  # (role, tool, text)

    def add(role, tool, text):
        lines.append((role, tool, text))

    add("system", None, f"|player|p1|{p1}")
    add("system", None, f"|player|p2|{p2}")
    add("system", None, f"|teamsize|p1|{team_n}")
    add("system", None, f"|teamsize|p2|{team_n}")
    add("system", None, "|start")

    nick = [[(f"Nick{si}{j}" if rng.random() < 0.25 else sp_disp[m["species"]])
             for j, m in enumerate(t)] for si, t in enumerate(teams)]
    active = [0, 0]
    alive = [list(range(team_n)), list(range(team_n))]

    def details(side, slot):
        m = teams[side][slot]
        return f"{sp_disp[m['species']]}, L{m['level']}"

    def sw(side, slot, verb="switch", hp=100):
        add(f"p{side + 1}", None,
            f"|{verb}|p{side + 1}a: {nick[side][slot]}|{details(side, slot)}|{hp}/100")
        active[side] = slot

    sw(0, 0)
    sw(1, 0)

    if rng.random() < 0.05:
        max_turns = int(rng.integers(1, 3))
    else:
        max_turns = int(np.clip(rng.geometric(1.0 / 14) + 2, 3, 60))
    p_ko = min(0.35, (team_n * 0.9) / max_turns / 2)

    turns = 0
    ended = False
    for t in range(1, max_turns + 1):
        turns = t
        add("system", None, f"|turn|{t}")
        for side in rng.permutation(2):
            side = int(side)
            opp = 1 - side
            me = teams[side][active[side]]
            if len(alive[side]) > 1 and rng.random() < 0.10:
                slot = int(rng.choice([s for s in alive[side] if s != active[side]]))
                sw(side, slot, hp=int(rng.integers(40, 101)))
                continue
            mv = me["moves"][int(rng.integers(4))]
            add(f"p{side + 1}", mv,
                f"|move|p{side + 1}a: {nick[side][active[side]]}|{mv_disp[mv]}"
                f"|p{opp + 1}a: {nick[opp][active[opp]]}")
            if mv in dims.UTURN_MOVES and len(alive[side]) > 1 and rng.random() < 0.7:
                # pivot: same side switches right after its move
                slot = int(rng.choice([s for s in alive[side] if s != active[side]]))
                sw(side, slot, hp=int(rng.integers(40, 101)))
                continue
            if mv in dims.ROAR_MOVES and len(alive[opp]) > 1 and rng.random() < 0.7:
                slot = int(rng.choice([s for s in alive[opp] if s != active[opp]]))
                sw(opp, slot, verb="drag", hp=int(rng.integers(40, 101)))
                continue
            if rng.random() < 0.02:
                itm = "Red Card" if rng.random() < 0.5 else "Eject Button"
                add(f"p{opp + 1}", itm.lower().replace(" ", ""),
                    f"|-enditem|p{opp + 1}a: {nick[opp][active[opp]]}|{itm}")
            if rng.random() < p_ko:
                # the defender faints
                add(f"p{opp + 1}", None,
                    f"|faint|p{opp + 1}a: {nick[opp][active[opp]]}")
                alive[opp].remove(active[opp])
                if alive[opp]:
                    slot = int(rng.choice(alive[opp]))
                    sw(opp, slot)
                else:
                    ended = True
                    break
        if ended:
            break

    if corrupt:
        k = int(rng.integers(5, len(lines)))
        if rng.random() < 0.5:
            lines.insert(k, ("system", None, "|move|Bad"))
        else:
            lines.insert(k, ("p1", None, "|switch|p1a: X|Blorbo, L100|100/100"))

    tie = False
    if not alive[0] and not alive[1]:
        tie = True
    elif not alive[0]:
        winner = p2
    elif not alive[1]:
        winner = p1
    else:
        if rng.random() < 0.02:
            tie = True
        else:
            winner = p1 if len(alive[0]) > len(alive[1]) or (
                len(alive[0]) == len(alive[1]) and rng.random() < 0.5) else p2
    if tie:
        add("system", None, "|tie")
        winner = ""
    else:
        add("system", None, f"|win|{winner}")

    r1 = rating(20 if winner == p1 else -20)
    r2 = rating(20 if winner == p2 else -20)

    def team_rows(team):
        return [dict(
            species=m["species"], item=m["item"], ability=m["ability"],
            nature=m["nature"], moves=list(m["moves"]),
            ev_hp=m["evs"]["hp"], ev_atk=m["evs"]["atk"], ev_def=m["evs"]["def"],
            ev_spa=m["evs"]["spa"], ev_spd=m["evs"]["spd"], ev_spe=m["evs"]["spe"],
            iv_hp=m["ivs"]["hp"], iv_atk=m["ivs"]["atk"], iv_def=m["ivs"]["def"],
            iv_spa=m["ivs"]["spa"], iv_spd=m["ivs"]["spd"], iv_spe=m["ivs"]["spe"],
            level=m["level"], happiness=m["happiness"], tera_type=m["tera_type"],
        ) for m in team]

    # roomid: public battles carry the plain room name; a deterministic
    # ~20% minority are password-protected rooms whose id ends in "pw"
    # (the F6 filter key — anon/src/index.ts roomid.endsWith('pw')).
    # Derived from md5(conv_id), NOT an rng draw, so adding it did not
    # perturb the generator's random stream (corpus content is stable
    # across datagen versions except for new columns).
    import hashlib as _hl
    private = int(_hl.md5(conv_id.encode()).hexdigest()[:8], 16) % 5 == 0
    roomid = conv_id + ("-deadbeefpw" if private else "")

    meta = dict(
        conv_id=conv_id, format=fmt, p1=p1, p2=p2, roomid=roomid,
        winner=winner, end_type="normal", turns=turns,
        # exact transcript line count: the streaming FSM's primary
        # completeness signal (robust to post-terminal lines)
        n_lines=len(lines),
        p1_rating_rpr=r1[0], p1_rating_rprd=r1[1],
        p2_rating_rpr=r2[0], p2_rating_rprd=r2[1],
        p1_team=team_rows(teams[0]), p2_team=team_rows(teams[1]),
        ts=start_ts.replace(tzinfo=None),
        day=start_ts.date().isoformat(),
    )
    turn_rows = [dict(
        conv_id=conv_id, turn_idx=i, role=role, text=text, tool=tool,
        ts=(start_ts + timedelta(seconds=i)).replace(tzinfo=None),
        format=fmt, day=meta["day"],
    ) for i, (role, tool, text) in enumerate(lines)]
    return meta, turn_rows


def generate_pandas(n_convs: int, seed: int = dims.SEED):
    """Serial generation → (conversations pdf, transcripts pdf)."""
    metas, turns = [], []
    for i in range(n_convs):
        m, t = gen_conversation(i, n_convs, seed)
        metas.append(m)
        turns.extend(t)
    return pd.DataFrame(metas), pd.DataFrame(turns)


# ---------------------------------------------------------------------
# on-disk cache

def corpus_dir(tier: str, base: str | None = None) -> str:
    base = base or os.environ.get("STATS_SPARK_DATA", "/root/repo/data")
    suffix = tier
    if tier == "bench":  # bench size is tunable — cache per size
        suffix = f"bench_{TIERS['bench']}"
    return os.path.join(base, f"corpus_{suffix}")


def ensure_corpus(tier: str, base: str | None = None, spark=None) -> dict:
    """Generate-once (cached) corpus for a tier; returns table paths.

    t1/t2 generate serially (small).  bench generates in parallel via
    Spark mapInPandas over conv-index ranges — identical output thanks
    to per-conv seeding — and writes transcripts partitioned by
    ``format`` (the routing key; partition pruning at scale, SURVEY §2.1
    S1).
    """
    d = corpus_dir(tier, base)
    tpath = os.path.join(d, "transcripts.parquet")
    cpath = os.path.join(d, "conversations.parquet")
    n = TIERS[tier]
    stamp = f"n_convs={n}\ndatagen={datagen_version()}\n"
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == stamp:
                return {"transcripts": tpath, "conversations": cpath,
                        "dir": d}
        # datagen code changed since this corpus was written — a stale
        # corpus must never feed tests or the driver gate (its schema /
        # content would silently diverge from a fresh environment's)
        import shutil
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    if tier == "bench" and spark is not None:
        _generate_spark(spark, n, tpath, cpath)
    else:
        convs, turns = generate_pandas(n)
        _write_parquet(turns, tpath, partition_cols=["format"])
        _write_parquet(convs, cpath, partition_cols=None)
    with open(marker, "w") as f:
        f.write(stamp)
    return {"transcripts": tpath, "conversations": cpath, "dir": d}


def datagen_version() -> str:
    """Hash of the datagen code: corpora regenerate when it changes so
    cached and freshly-generated environments agree byte-for-byte."""
    import hashlib

    h = hashlib.md5()
    here = os.path.dirname(__file__)
    for mod in ("corpus.py", "dims.py"):
        with open(os.path.join(here, mod), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:10]


def _write_parquet(pdf: pd.DataFrame, path: str, partition_cols=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.Table.from_pandas(pdf, preserve_index=False)
    # Spark cannot read TIMESTAMP(NANOS) parquet — coerce to micros.
    schema = pa.schema([
        pa.field(f.name, pa.timestamp("us")) if pa.types.is_timestamp(f.type)
        else f for f in table.schema
    ])
    table = table.cast(schema)
    if partition_cols:
        pq.write_to_dataset(table, root_path=path, partition_cols=partition_cols)
    else:
        pq.write_table(table, path)


def _generate_spark(spark, n_convs: int, tpath: str, cpath: str):
    """Parallel generation: one pass for transcripts, one for convs."""
    from pyspark.sql import functions as F

    sc_parallelism = spark.sparkContext.defaultParallelism
    idx = spark.range(n_convs).repartition(sc_parallelism * 4)

    def gen_turns(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                _, t = gen_conversation(int(i), n_convs)
                rows.extend(t)
            yield pd.DataFrame(rows)

    turn_schema = ("conv_id string, turn_idx int, role string, text string, "
                   "tool string, ts timestamp, format string, day string")
    (idx.mapInPandas(gen_turns, schema=turn_schema)
        .write.mode("overwrite").partitionBy("format").parquet(tpath))

    def gen_metas(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                m, _ = gen_conversation(int(i), n_convs)
                m = dict(m)
                import json
                m["p1_team"] = json.dumps(m["p1_team"])
                m["p2_team"] = json.dumps(m["p2_team"])
                rows.append(m)
            yield pd.DataFrame(rows)

    meta_schema = (
        "conv_id string, format string, p1 string, p2 string, roomid string, "
        "winner string, end_type string, turns int, n_lines int, "
        "p1_rating_rpr double, p1_rating_rprd double, "
        "p2_rating_rpr double, p2_rating_rprd double, p1_team string, "
        "p2_team string, ts timestamp, day string")
    team_elem = (
        "array<struct<species:string,item:string,ability:string,nature:string,"
        "moves:array<string>,ev_hp:int,ev_atk:int,ev_def:int,ev_spa:int,"
        "ev_spd:int,ev_spe:int,iv_hp:int,iv_atk:int,iv_def:int,iv_spa:int,"
        "iv_spd:int,iv_spe:int,level:int,happiness:int,tera_type:string>>")
    (idx.mapInPandas(gen_metas, schema=meta_schema)
        .withColumn("p1_team", F.from_json("p1_team", team_elem))
        .withColumn("p2_team", F.from_json("p2_team", team_elem))
        .write.mode("overwrite").parquet(cpath))
