"""Published base stats + types for the fixture species, and gen-aware
stat math (the @pkmn/data subset the classifier and spread computation
consume).

All of this is public game data, hand-curated for the ~110 species the
reference's fixture logs touch.  Species lookups use the DEFAULT gen-9
data (util.ts ignoreGen with legacy=true) while the stat FORMULA uses
the format's own generation (gen.stats.calc), so gen-1/2 formats run
the DV-based legacy formula with natures ignored.
"""

from __future__ import annotations

import math

# species_id: (hp, atk, def, spa, spd, spe) — gen-9 data
BASE_STATS: dict[str, tuple[int, int, int, int, int, int]] = {
    # the reference's pinned @pkmn data carries the gen-7 Shield
    # defenses with the gen-8 Blade offenses (validated against the
    # golden stalliness means across all three Aegislash formats)
    "aegislash": (60, 50, 140, 50, 140, 60),
    "aegislashblade": (60, 140, 50, 140, 50, 60),
    "alakazam": (55, 50, 45, 135, 95, 120),
    "amoonguss": (114, 85, 70, 85, 80, 30),
    "arceus": (120, 120, 120, 120, 120, 120),
    "bagon": (45, 75, 60, 40, 30, 50),
    "bayleef": (60, 62, 80, 63, 80, 60),
    "beedrill": (65, 90, 40, 45, 80, 75),
    "camerupt": (70, 100, 70, 105, 75, 40),
    "cameruptmega": (70, 120, 100, 145, 105, 20),
    "carnivine": (74, 100, 72, 90, 72, 46),
    "carracosta": (74, 108, 133, 83, 65, 32),
    "castform": (70, 70, 70, 70, 70, 70),
    "charizard": (78, 84, 78, 109, 85, 100),
    "charizardmegax": (78, 130, 111, 130, 85, 100),
    "charizardmegay": (78, 104, 78, 159, 115, 100),
    "chikorita": (45, 49, 65, 49, 65, 45),
    "clefable": (95, 70, 73, 95, 90, 60),
    "cloyster": (50, 95, 180, 85, 45, 70),
    "combusken": (60, 85, 60, 85, 60, 55),
    "cosmog": (43, 29, 31, 29, 31, 37),
    "cresselia": (120, 70, 110, 75, 120, 85),
    "darmanitan": (105, 140, 55, 30, 55, 95),
    "deino": (52, 65, 50, 45, 50, 38),
    "diancie": (50, 100, 150, 100, 150, 50),
    "ditto": (48, 48, 48, 48, 48, 48),
    "dragonite": (91, 134, 95, 100, 100, 80),
    "dugtrio": (35, 100, 50, 50, 70, 120),
    "eevee": (55, 55, 50, 45, 65, 55),
    "electabuzz": (65, 83, 57, 95, 85, 105),
    "exeggutor": (95, 95, 85, 125, 75, 55),
    "florges": (78, 65, 68, 112, 154, 75),
    "furret": (85, 76, 64, 45, 55, 90),
    "gastly": (30, 35, 30, 100, 35, 80),
    "gastrodon": (111, 83, 68, 92, 82, 39),
    "genesect": (71, 120, 95, 120, 95, 99),
    "greninja": (72, 95, 67, 103, 71, 122),
    "greninjaash": (72, 145, 67, 153, 71, 132),
    "heliolisk": (62, 55, 52, 109, 94, 109),
    "hitmonlee": (50, 120, 53, 35, 110, 87),
    "honchkrow": (100, 125, 52, 105, 52, 71),
    "honedge": (45, 80, 100, 35, 37, 28),
    "jolteon": (65, 65, 60, 110, 95, 130),
    "kartana": (59, 181, 131, 59, 31, 109),
    "keldeo": (91, 72, 90, 129, 90, 108),
    "kingambit": (100, 135, 120, 60, 85, 50),
    "kingler": (55, 130, 115, 50, 50, 75),
    "koffing": (40, 65, 95, 60, 45, 35),
    "kricketot": (37, 25, 41, 25, 41, 25),
    "kyogre": (100, 100, 90, 150, 140, 90),
    "kyogreprimal": (100, 150, 90, 180, 160, 90),
    "kyuremblack": (125, 170, 100, 120, 90, 95),
    "lanturn": (125, 58, 58, 76, 76, 67),
    "latios": (80, 90, 80, 130, 110, 110),
    "lilligant": (70, 60, 75, 110, 75, 90),
    "linoone": (78, 70, 61, 50, 61, 100),
    "loudred": (84, 71, 43, 71, 43, 48),
    "ludicolo": (80, 70, 70, 90, 100, 70),
    "lycanrocdusk": (75, 117, 65, 55, 65, 110),
    "machop": (70, 80, 50, 35, 35, 35),
    "magcargo": (60, 50, 120, 90, 80, 30),
    "magikarp": (20, 10, 55, 15, 20, 80),
    "magnezone": (70, 70, 115, 130, 90, 60),
    "meloetta": (100, 77, 77, 128, 128, 90),
    "meloettapirouette": (100, 128, 90, 77, 77, 128),
    "metagross": (80, 135, 130, 95, 90, 70),
    "metagrossmega": (80, 145, 150, 105, 110, 110),
    "mimikyu": (55, 90, 80, 50, 105, 96),
    "misdreavus": (60, 60, 60, 85, 85, 85),
    "naganadel": (73, 73, 73, 127, 73, 121),
    "necrozma": (97, 107, 101, 127, 89, 79),
    "necrozmaduskmane": (97, 157, 127, 113, 109, 77),
    "nidoqueen": (90, 92, 87, 75, 85, 76),
    "nidoranm": (46, 57, 40, 40, 40, 50),
    "nidorino": (61, 72, 57, 55, 55, 65),
    "ogerpon": (80, 120, 84, 60, 96, 110),
    "ogerponcornerstone": (80, 120, 84, 60, 96, 110),
    "ogerponhearthflame": (80, 120, 84, 60, 96, 110),
    "ogerponwellspring": (80, 120, 84, 60, 96, 110),
    "palafin": (100, 70, 72, 53, 62, 100),
    "palafinhero": (100, 160, 97, 106, 87, 100),
    "pangoro": (95, 124, 78, 69, 71, 58),
    "pelipper": (60, 50, 100, 95, 70, 65),
    "pyukumuku": (55, 60, 130, 30, 130, 5),
    "raichualola": (60, 85, 50, 95, 85, 110),
    "rayquaza": (105, 150, 90, 150, 90, 95),
    "rhyperior": (115, 140, 130, 55, 55, 40),
    "ribombee": (60, 55, 60, 95, 70, 124),
    "rotomwash": (50, 65, 107, 105, 107, 86),
    "salamence": (95, 135, 80, 110, 80, 100),
    "scolipede": (60, 100, 89, 55, 69, 112),
    "scrafty": (65, 90, 115, 45, 115, 58),
    "seadra": (55, 65, 95, 95, 45, 85),
    "shaymin": (100, 100, 100, 100, 100, 100),
    "shayminsky": (100, 103, 75, 120, 75, 127),
    "shedinja": (1, 90, 45, 30, 30, 40),
    "shelgon": (65, 95, 100, 60, 50, 50),
    "snorlax": (160, 110, 65, 65, 110, 30),
    "starmie": (60, 75, 85, 100, 85, 115),
    "suicune": (100, 75, 115, 90, 115, 85),
    "swampert": (100, 110, 90, 85, 90, 60),
    "swampertmega": (100, 150, 110, 95, 110, 70),
    "swanna": (75, 87, 63, 87, 63, 98),
    "swoobat": (67, 57, 55, 77, 55, 114),
    "taillow": (40, 55, 30, 30, 30, 85),
    "tauros": (75, 100, 95, 40, 70, 110),
    "tentacruel": (80, 70, 65, 80, 120, 100),
    "terapagos": (90, 65, 85, 65, 85, 60),
    "togepi": (35, 20, 65, 40, 65, 20),
    "unown": (48, 72, 48, 72, 48, 48),
    "whismur": (64, 51, 23, 51, 23, 28),
    "wimpod": (25, 35, 40, 20, 30, 80),
    "wishiwashi": (45, 20, 20, 25, 25, 40),
    "wooper": (55, 45, 45, 25, 25, 15),
    "zoroark": (60, 105, 60, 120, 60, 105),
    "zygarde": (108, 100, 121, 81, 95, 95),
}

# species_id: types (gen-9 data; base formes for tag() analysis)
TYPES: dict[str, tuple[str, ...]] = {
    "aegislash": ("steel", "ghost"), "alakazam": ("psychic",),
    "amoonguss": ("grass", "poison"), "arceus": ("normal",),
    "bagon": ("dragon",), "bayleef": ("grass",),
    "beedrill": ("bug", "poison"), "camerupt": ("fire", "ground"),
    "carnivine": ("grass",), "carracosta": ("water", "rock"),
    "castform": ("normal",), "charizard": ("fire", "flying"),
    "chikorita": ("grass",), "clefable": ("fairy",),
    "cloyster": ("water", "ice"), "combusken": ("fire", "fighting"),
    "cosmog": ("psychic",), "cresselia": ("psychic",),
    "darmanitan": ("fire",), "deino": ("dark", "dragon"),
    "diancie": ("rock", "fairy"), "ditto": ("normal",),
    "dragonite": ("dragon", "flying"), "dugtrio": ("ground",),
    "eevee": ("normal",), "electabuzz": ("electric",),
    "exeggutor": ("grass", "psychic"), "florges": ("fairy",),
    "furret": ("normal",), "gastly": ("ghost", "poison"),
    "gastrodon": ("water", "ground"), "genesect": ("bug", "steel"),
    "greninja": ("water", "dark"), "heliolisk": ("electric", "normal"),
    "hitmonlee": ("fighting",), "honchkrow": ("dark", "flying"),
    "honedge": ("steel", "ghost"), "jolteon": ("electric",),
    "kartana": ("grass", "steel"), "keldeo": ("water", "fighting"),
    "kingambit": ("dark", "steel"), "kingler": ("water",),
    "koffing": ("poison",), "kricketot": ("bug",),
    "kyogre": ("water",), "kyuremblack": ("dragon", "ice"),
    "lanturn": ("water", "electric"), "latios": ("dragon", "psychic"),
    "lilligant": ("grass",), "linoone": ("normal",),
    "loudred": ("normal",), "ludicolo": ("water", "grass"),
    "lycanrocdusk": ("rock",), "machop": ("fighting",),
    "magcargo": ("fire", "rock"), "magikarp": ("water",),
    "magnezone": ("electric", "steel"),
    "meloetta": ("normal", "psychic"), "metagross": ("steel", "psychic"),
    "mimikyu": ("ghost", "fairy"), "misdreavus": ("ghost",),
    "naganadel": ("poison", "dragon"), "necrozma": ("psychic",),
    "necrozmaduskmane": ("psychic", "steel"),
    "nidoqueen": ("poison", "ground"), "nidoranm": ("poison",),
    "nidorino": ("poison",), "ogerpon": ("grass",),
    "ogerponcornerstone": ("grass", "rock"),
    "ogerponhearthflame": ("grass", "fire"),
    "ogerponwellspring": ("grass", "water"), "palafin": ("water",),
    "pangoro": ("fighting", "dark"), "pelipper": ("water", "flying"),
    "pyukumuku": ("water",), "raichualola": ("electric", "psychic"),
    "rayquaza": ("dragon", "flying"), "rhyperior": ("ground", "rock"),
    "ribombee": ("bug", "fairy"), "rotomwash": ("electric", "water"),
    "salamence": ("dragon", "flying"), "scolipede": ("bug", "poison"),
    "scrafty": ("dark", "fighting"), "seadra": ("water",),
    "shaymin": ("grass",), "shayminsky": ("grass", "flying"),
    "shedinja": ("bug", "ghost"), "shelgon": ("dragon",),
    "snorlax": ("normal",), "starmie": ("water", "psychic"),
    "suicune": ("water",), "swampert": ("water", "ground"),
    "swanna": ("water", "flying"), "swoobat": ("psychic", "flying"),
    "taillow": ("normal", "flying"), "tauros": ("normal",),
    "tentacruel": ("water", "poison"), "terapagos": ("normal",),
    "togepi": ("fairy",), "unown": ("psychic",),
    "whismur": ("normal",), "wimpod": ("bug", "water"),
    "wishiwashi": ("water",), "wooper": ("water", "ground"),
    "zoroark": ("dark",), "zygarde": ("dragon", "ground"),
    # mega/forme types mirror their bases for the fixtures' purposes
    "cameruptmega": ("fire", "ground"),
    "charizardmegax": ("fire", "dragon"),
    "charizardmegay": ("fire", "flying"),
    "metagrossmega": ("steel", "psychic"),
    "swampertmega": ("water", "ground"),
    "kyogreprimal": ("water",),
    "greninjaash": ("water", "dark"),
    "palafinhero": ("water",),
    "keldeoresolute": ("water", "fighting"),
}

# nature → (plus, minus); neutral natures have no effect
NATURES: dict[str, tuple[str | None, str | None]] = {
    "hardy": (None, None), "lonely": ("atk", "def"), "brave": ("atk", "spe"),
    "adamant": ("atk", "spa"), "naughty": ("atk", "spd"),
    "bold": ("def", "atk"), "docile": (None, None),
    "relaxed": ("def", "spe"), "impish": ("def", "spa"),
    "lax": ("def", "spd"), "timid": ("spe", "atk"), "hasty": ("spe", "def"),
    "serious": (None, None), "jolly": ("spe", "spa"), "naive": ("spe", "spd"),
    "modest": ("spa", "atk"), "mild": ("spa", "def"), "quiet": ("spa", "spe"),
    "bashful": (None, None), "rash": ("spa", "spd"), "calm": ("spd", "atk"),
    "gentle": ("spd", "def"), "sassy": ("spd", "spe"),
    "careful": ("spd", "spa"), "quirky": (None, None),
}

STATS = ["hp", "atk", "def", "spa", "spd", "spe"]


def to_dv(iv: int) -> int:
    return iv >> 1


def calc_stat(gen: int, stat: str, base: int, iv: int, ev: int, level: int,
              nature: str | None) -> int:
    """gen.stats.calc — modern (gen ≥ 3) vs the legacy DV formula
    (gens 1-2: natures ignored, IVs are DVs)."""
    if gen < 3:
        # gens 1-2: IVs are DVs, natures ignored; EVs enter as ev/4
        # exactly like the modern formula (verified by inverting the
        # reference's golden gen1 spread round-trips)
        dv = to_dv(iv)
        core = math.floor(
            ((base + dv) * 2 + math.floor(ev / 4)) * level / 100)
        if stat == "hp":
            return core + level + 10
        return core + 5
    core = math.floor((2 * base + iv + math.floor(ev / 4)) * level / 100)
    if stat == "hp":
        return 1 if base == 1 else core + level + 10
    plus, minus = NATURES.get(nature or "hardy", (None, None))
    n = 1.1 if plus == stat else 0.9 if minus == stat else 1.0
    return math.floor((core + 5) * n)


def stat_to_ev(gen: int, stat: str, val: int, base: int, iv: int,
               level: int, nature: str | None) -> int:
    """statToEV — stats.ts:430-447 (incl. the gen<3 DV conversion)."""
    if gen < 3:
        iv = to_dv(iv) * 2
    if stat == "hp":
        if base == 1:
            return 0
        return max(0, (math.ceil((val - level - 10) * 100 / level)
                       - 2 * base - iv) * 4)
    plus, minus = NATURES.get(nature or "hardy", (None, None))
    n = 1.1 if plus == stat else 0.9 if minus == stat else 1.0
    return max(0, (math.ceil((math.ceil(val / n) - 5) * 100 / level)
                   - 2 * base - iv) * 4)


def legacy_spread(gen: int, species: str, nature: str, evs: dict,
                  ivs: dict, level: int) -> str:
    """getSpread with legacy=true — stats.ts:391-412: ONLY the def EV
    goes through the stat round-trip; the rest stay raw.  The nature
    prefix is the display name (capitalized id)."""
    base = BASE_STATS[species]
    out = []
    for i, stat in enumerate(STATS):
        ev = int(evs.get(stat, 0))
        if stat == "def":
            val = calc_stat(gen, stat, base[i], int(ivs.get(stat, 31)), ev,
                            level, nature)
            ev = stat_to_ev(gen, stat, val, base[i], int(ivs.get(stat, 31)),
                            level, nature)
        out.append(str(ev))
    return f"{nature.capitalize()}:{'/'.join(out)}"
