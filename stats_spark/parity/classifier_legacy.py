"""Legacy-mode team classifier for the parity harness — classifyTeam
with legacy=true (`/root/reference/stats/src/classifier.ts`), the mode
the reference's golden fixtures were generated in.

Legacy mode uses the HARDCODED move-category tables
(classifier.ts:518-761 exports) instead of derivations, the DRAGONS
list, and gen-aware stat math (gen 1-2 = DV formula).  All tables here
are published game-data/config constants from the reference.

Scale note: this runs inside the parse/classify mapInPandas (per-team
Python, like the reference's own parse-time classification); at corpus
scale it is Arrow-batched alongside the FSM.
"""

from __future__ import annotations

import math

from stats_spark.parity import gen_stats as G
from stats_spark.parity.gen_data import SPECIES

LOG3_LOG2 = math.log(3) / math.log(2)

# classifier.ts:518-521, 549-553, 579-586, 607-615, 635-638, 651-653,
# 661, 667, 681-683, 703-705, 719, 725-728, 737-741 — the legacy tables
GREATER_SETUP_MOVES = {
    "curse", "dragondance", "growth", "shiftgear", "swordsdance",
    "fierydance", "nastyplot", "tailglow", "quiverdance", "geomancy"}
LESSER_SETUP_MOVES = {
    "acupressure", "bulkup", "coil", "howl", "workup", "meditate",
    "sharpen", "calmmind", "chargebeam", "agility", "autotomize",
    "flamecharge", "rockpolish", "doubleteam", "minimize", "tailwind",
    "poweruppunch", "rototiller"}
SETUP_MOVES = {
    "acupressure", "bellydrum", "bulkup", "coil", "curse", "dragondance",
    "growth", "honeclaws", "howl", "meditate", "sharpen", "shellsmash",
    "shiftgear", "swordsdance", "workup", "calmmind", "chargebeam",
    "fierydance", "nastyplot", "tailglow", "quiverdance", "agility",
    "autotomize", "flamecharge", "rockpolish", "doubleteam", "minimize",
    "substitute", "acidarmor", "barrier", "cosmicpower", "cottonguard",
    "defendorder", "defensecurl", "harden", "irondefense", "stockpile",
    "withdraw", "amnesia", "charge", "ingrain"}
GRAVITY_MOVES = {
    "guillotine", "fissure", "sheercold", "dynamicpunch", "inferno",
    "zapcannon", "grasswhistle", "sing", "supersonic", "hypnosis",
    "blizzard", "focusblast", "gunkshot", "hurricane", "smog", "thunder",
    "clamp", "dragonrush", "eggbomb", "irontail", "lovelykiss",
    "magmastorm", "megakick", "poisonpowder", "slam", "sleeppowder",
    "stunspore", "sweetkiss", "willowisp", "crosschop", "darkvoid",
    "furyswipes", "headsmash", "hydropump", "kinesis", "psywave",
    "rocktomb", "stoneedge", "submission", "boneclub", "bonerush",
    "bonemerang", "bulldoze", "dig", "drillrun", "earthpower",
    "earthquake", "magnitude", "mudbomb", "mudshot", "mudslap",
    "sandattack", "spikes", "toxicspikes"}
RECOVERY_MOVES = {
    "recover", "slackoff", "healorder", "milkdrink", "roost", "moonlight",
    "morningsun", "synthesis", "wish", "aquaring", "rest", "softboiled",
    "swallow", "leechseed"}
PROTECT_MOVES = {"protect", "detect", "kingsshield", "matblock",
                 "spikyshield"}
PHAZING_MOVES = {"whirlwind", "roar", "circlethrow", "dragontail"}
PARALYSIS_MOVES = {"thunderwave", "stunspore", "glare", "nuzzle"}
CONFUSION_MOVES = {"supersonic", "confuseray", "swagger", "flatter",
                   "teeterdance", "yawn"}
SLEEP_MOVES = {"darkvoid", "grasswhistle", "hypnosis", "lovelykiss",
               "sing", "sleeppowder", "spore"}
OHKO_MOVES = {"guillotine", "fissure", "sheercold"}
GREATER_OFFENSIVE_MOVES = {
    "selfdestruct", "explosion", "destinybond", "perishsong", "memento",
    "healingwish", "lunardance", "finalgambit"}
LESSER_OFFENSIVE_MOVES = {
    "jumpkick", "doubleedge", "submission", "petaldance", "hijumpkick",
    "outrage", "volttackle", "closecombat", "flareblitz", "bravebird",
    "woodhammer", "headsmash", "headcharge", "wildcharge", "takedown",
    "dragonascent"}

# classifier.ts:109-111, 194-201, 395-443
TRAPPING_ABILITIES = {"arenatrap", "magnetpull", "shadowtag"}
TRAPPING_MOVES = {"block", "meanlook", "spiderweb", "pursuit"}
SETUP_ABILITIES = {"angerpoint", "contrary", "moody", "moxie",
                   "speedboost"}
DRAGONS = {
    "dratini", "dragonair", "bagon", "shelgon", "axew", "fraxure",
    "haxorus", "druddigon", "dragonite", "altaria", "salamence", "latias",
    "latios", "rayquaza", "gible", "gabite", "garchomp", "reshiram",
    "zekrom", "kyurem", "kyuremwhite", "kyuremblack", "kingdra",
    "vibrava", "flygon", "dialga", "palkia", "giratina", "giratinaorigin",
    "deino", "zweilous", "hydreigon"}
GREATER_OFFENSIVE_ABILITIES = {"purepower", "hugepower", "speedboost",
                               "moody"}
LESSER_OFFENSIVE_ABILITIES = {
    "chlorophyll", "download", "hustle", "moxie", "reckless", "sandrush",
    "solarpower", "swiftswim", "technician", "tintedlens", "darkaura",
    "fairyaura", "infiltrator", "parentalbond", "protean", "strongjaw",
    "sweetveil", "toughclaws", "aerilate", "normalize", "pixilate",
    "refrigerate"}
LESSER_DEFENSIVE_ABILITIES = {
    "dryskin", "filter", "hydration", "icebody", "intimidate",
    "ironbarbs", "marvelscale", "naturalcure", "magicguard", "multiscale",
    "raindish", "roughskin", "solidrock", "thickfat", "unaware",
    "aromaveil", "bulletproof", "cheekpouch", "gooey", "regenerator"}
GREATER_DEFENSIVE_ABILITIES = {"slowstart", "truant", "furcoat",
                               "harvest"}
LESSER_BOOSTING_ITEM = {
    "expertbelt", "wiseglasses", "muscleband", "dracoplate", "dreadplate",
    "earthplate", "fistplate", "flameplate", "icicleplate", "insectplate",
    "ironplate", "meadowplate", "mindplate", "skyplate", "splashplate",
    "spookyplate", "stoneplate", "toxicplate", "zapplate", "blackglasses",
    "charcoal", "dragonfang", "hardstone", "magnet", "metalcoat",
    "miracleseed", "mysticwater", "nevermeltice", "poisonbarb",
    "sharpbeak", "silkscarf", "silverpowder", "softsand", "spelltag",
    "twistedspoon", "pixieplate"}
GREATER_BOOSTING_ITEM = {
    "firegem", "watergem", "electricgem", "grassgem", "icegem",
    "fightinggem", "poisongem", "groundgem", "flyinggem", "psychicgem",
    "buggem", "rockgem", "ghostgem", "darkgem", "steelgem", "normalgem",
    "focussash", "mentalherb", "powerherb", "whiteherb", "absorbbulb",
    "berserkgene", "cellbattery", "airballoon", "ejectbutton",
    "shedshell", "aguavberry", "apicotberry", "aspearberry", "babiriberry",
    "chartiberry", "cheriberry", "chestoberry", "chilanberry",
    "chopleberry", "cobaberry", "custapberry", "enigmaberry", "figyberry",
    "ganlonberry", "habanberry", "iapapaberry", "jabocaberry",
    "kasibberry", "kebiaberry", "lansatberry", "leppaberry", "liechiberry",
    "lumberry", "magoberry", "micleberry", "occaberry", "oranberry",
    "passhoberry", "payapaberry", "pechaberry", "persimberry",
    "petayaberry", "rawstberry", "rindoberry", "rowapberry", "salacberry",
    "shucaberry", "sitrusberry", "starfberry", "tangaberry", "wacanberry",
    "wikiberry", "yacheberry", "keeberry", "marangaberry", "roseliberry",
    "snowball", "choiceband", "choicescarf", "choicespecs", "lifeorb"}

SLOW_NATURES = {"brave", "relaxed", "quiet", "sassy"}

STATS = G.STATS


def _is_mega(sid: str) -> bool:
    return sid in SPECIES and SPECIES[sid][2]


def _base_of(sid: str) -> str:
    return SPECIES[sid][1] if sid in SPECIES else sid


def _mon_stats(gen: int, sid: str, mon: dict) -> dict:
    base = G.BASE_STATS[sid]
    return {s: G.calc_stat(gen, s, base[i], int(mon.get(f"iv_{s}", 31)),
                           int(mon.get(f"ev_{s}", 0)),
                           int(mon.get("level", 100)), mon.get("nature"))
            for i, s in enumerate(STATS)}


def _calc_stats(gen: int, sid: str, mon: dict) -> dict:
    """calcStats — classifier.ts:163-174 incl. the Aegislash
    stance-change blade averaging."""
    stats = _mon_stats(gen, sid, mon)
    if sid == "aegislash" and mon.get("ability") == "stancechange":
        blade = _mon_stats(gen, "aegislashblade", mon)
        blade["def"] = math.floor((blade["def"] + stats["def"]) / 2)
        blade["spd"] = math.floor((blade["spd"] + stats["spd"]) / 2)
        return blade
    return stats


def _base_stalliness(gen: int, sid: str, mon: dict) -> float:
    """baseStalliness — classifier.ts:146-161."""
    if sid == "shedinja":
        return 0.0
    if sid == "ditto":
        return LOG3_LOG2
    st = _calc_stats(gen, sid, mon)
    level = int(mon.get("level", 100))
    return -math.log(
        ((math.floor(2.0 * level + 10) / 250
          * max(st["atk"], st["spa"]) / max(st["def"], st["spd"]))
         * 120 + 2) * 0.925 / st["hp"]) / math.log(2)


def _ability_mod(ability: str) -> float:
    if ability in GREATER_OFFENSIVE_ABILITIES:
        return -1.0
    if ability in LESSER_OFFENSIVE_ABILITIES:
        return -0.5
    if ability in LESSER_DEFENSIVE_ABILITIES:
        return 0.5
    if ability in GREATER_DEFENSIVE_ABILITIES:
        return 1.0
    return 0.0


def _item_mod(mon: dict) -> float:
    """itemStallinessModifier — classifier.ts:445-477."""
    item, ability, sid = mon["item"], mon["ability"], mon["species"]
    if item in ("weaknesspolicy", "lightclay"):
        return -1.0
    if item in ("rockyhelmet", "eviolite"):
        return 0.5
    if item == "toxicorb":
        if ability == "poisonheal":
            return 0.5
        if ability in ("toxicboost", "guts", "quickfeet"):
            return -1.0
    if item == "flameorb" and ability in ("flareboost", "guts", "quickfeet"):
        return -1.0
    if item == "souldew" and sid in ("latios", "latias"):
        return -0.5
    if item == "thickclub" and sid in ("cubone", "marowak"):
        return -1.0
    if item == "lightball" and sid == "pikachu":
        return -1.0
    if sid == "clamperl":
        if item == "deepseatooth":
            return -1.0
        if item == "deepseascale":
            return 1.0
    if item == "adamantorb" and sid == "dialga":
        return -0.25
    if item == "lustrousorb" and sid == "palkia":
        return -0.25
    if item == "griseousorb" and sid == "giratinaorigin":
        return -0.25
    if item in LESSER_BOOSTING_ITEM:
        return -0.25
    if item in GREATER_BOOSTING_ITEM:
        return -0.5
    return 0.0


def _moves_mod(moves: set) -> float:
    """movesStallinessModifier — classifier.ts:479-516."""
    mod = 0.0
    mod += 1.0 if "toxic" in moves else 0.0
    mod += 0.5 if "spikes" in moves else 0.0
    mod += 0.5 if "toxicspikes" in moves else 0.0
    mod += 0.5 if "willowisp" in moves else 0.0
    mod += 0.5 if "psychoshift" in moves else 0.0
    mod += 0.5 if ("healbell" in moves or "aromatherapy" in moves) else 0.0
    mod += 0.5 if ("haze" in moves or "clearsmog" in moves) else 0.0
    mod -= 0.5 if "substitute" in moves else 0.0
    mod -= 0.5 if "superfang" in moves else 0.0
    mod -= 0.5 if "trick" in moves else 0.0
    mod -= 1.0 if "endeavor" in moves else 0.0
    mod += 1.0 if moves & RECOVERY_MOVES else 0.0
    mod += 1.0 if moves & PROTECT_MOVES else 0.0
    mod += 0.5 if moves & PHAZING_MOVES else 0.0
    mod += 0.5 if moves & PARALYSIS_MOVES else 0.0
    mod += 0.5 if moves & CONFUSION_MOVES else 0.0
    mod -= 0.5 if moves & SLEEP_MOVES else 0.0
    mod -= 0.5 if moves & LESSER_OFFENSIVE_MOVES else 0.0
    mod -= 1.0 if moves & GREATER_OFFENSIVE_MOVES else 0.0
    mod -= 1.0 if moves & OHKO_MOVES else 0.0
    if "bellydrum" in moves:
        mod -= 2.0
    elif "shellsmash" in moves:
        mod -= 1.5
    elif moves & GREATER_SETUP_MOVES:
        mod -= 1.0
    elif moves & LESSER_SETUP_MOVES:
        mod -= 0.5
    return mod


def _classify_forme(gen: int, sid: str, mon: dict) -> float:
    """classifyForme stalliness — classifier.ts:113-143."""
    moves = set(mon["moves"])
    ability = mon["ability"]
    s = _base_stalliness(gen, sid, mon)
    s += _ability_mod(ability)
    s += _item_mod(mon)
    s += _moves_mod(moves)
    if ability in TRAPPING_ABILITIES:
        s -= 1.0
    elif moves & TRAPPING_MOVES:
        s -= 0.5
    if ability == "harvest" or "recycle" in moves:
        s += 1.0
    if ability in ("sandstream", "snowwarning") \
            or moves & {"sandstorm", "hail"}:
        s += 0.5
    return s - LOG3_LOG2


def classify_pokemon(gen: int, mon: dict) -> tuple[int, float]:
    """classifyPokemon with legacy=true — classifier.ts:60-107: megas
    classify with BASE-forme stats and the (already-canonicalized) mega
    ability; both classifyForme calls coincide, so no averaging term
    differs."""
    sid = mon["species"]
    if _is_mega(sid):
        sid = _base_of(sid)
    stalliness = _classify_forme(gen, sid, mon)
    bias = (int(mon.get("ev_atk", 0)) + int(mon.get("ev_spa", 0))
            - int(mon.get("ev_hp", 0)) - int(mon.get("ev_def", 0))
            - int(mon.get("ev_spd", 0)))
    return bias, stalliness


def tag(gen: int, team: list[dict], stalliness: float) -> list[str]:
    """tag() with legacy=true — classifier.ts:203-393, capped counters
    verbatim."""
    weather = dict(rain=0, sun=0, sand=0, hail=0)
    s = dict(batonpass=0, tailwind=0, trickroom=0, slow=0, gravityMoves=0,
             gravity=0, voltturn=0, dragons=0, trappers=0, clearance=0,
             fear=0, choice=0, swagplay=0)
    possible_types = None
    for mon in team:
        sid = mon["species"]
        base_id = _base_of(sid) if _is_mega(sid) else sid
        types = [t.capitalize() for t in G.TYPES[base_id]]
        mv = set(mon["moves"])
        ability, item = mon["ability"], mon["item"]
        possible_types = (types if possible_types is None
                          else [t for t in possible_types if t in types])
        if ability in ("drizzle", "primordialsea"):
            weather["rain"] += 2
        elif ability in ("drought", "desolateland"):
            weather["sun"] += 2
        elif ability == "sandstream":
            weather["sand"] += 2
        elif ability == "snowwarning":
            weather["hail"] += 2
        if (weather["sun"] < 2 and sid == "charizard"
                and item == "charizarditey"):
            weather["sun"] += 2
        if weather["rain"] < 2 and "raindance" in mv:
            weather["rain"] += 2 if item == "damprock" else 1
        if weather["sun"] < 2 and "sunnyday" in mv:
            weather["sun"] += 2 if item == "heatrock" else 1
        if weather["sand"] < 2 and "sandstorm" in mv:
            weather["sand"] += 2 if item == "smoothrock" else 1
        if weather["hail"] < 2 and "hail" in mv:
            weather["hail"] += 2 if item == "icyrock" else 1
        if (s["batonpass"] < 2 and "batonpass" in mv
                and (ability in SETUP_ABILITIES or mv & SETUP_MOVES)):
            s["batonpass"] += 1
        if s["tailwind"] < 2 and "tailwind" in mv:
            s["tailwind"] += 1
        if "trickroom" in mv and "imprison" not in mv:
            s["trickroom"] += 1
        base_spe = G.BASE_STATS[base_id][5]
        if (s["slow"] < 2 and int(mon.get("ev_spe", 0)) < 5
                and (mon.get("nature") in SLOW_NATURES or base_spe <= 50)):
            s["slow"] += 1
        if s["gravity"] < 2 and "gravity" in mv:
            s["gravity"] += 1
        if mv & GRAVITY_MOVES:
            s["gravityMoves"] += 1
        if ((s["voltturn"] < 3 and item == "ejectbutton")
                or mv & {"voltswitch", "uturn", "batonpass"}):
            s["voltturn"] += 1
        if ((s["trappers"] < 3 and ability in TRAPPING_ABILITIES)
                or mv & {"block", "meanlook", "spiderweb"}):
            s["trappers"] += 1
        # NOTE the reference's precedence bug: (dragons < 2 && legacy)
        # ? DRAGONS : types — once capped, the TYPES branch applies
        if (sid in DRAGONS if s["dragons"] < 2
                else "Dragon" in types):
            s["dragons"] += 1
        if ((s["clearance"] < 2 and ability == "magicbounce")
                or "rapidspin" in mv):
            s["clearance"] += 1
        if (s["fear"] < 3 and (ability == "sturdy" or item == "focussash")
                and "endeavor" in mv):
            s["fear"] += 1
        if (s["choice"] < 4 and ability != "klutz"
                and item in ("choiceband", "choicescarf", "choicespecs")):
            s["choice"] += 1
        if s["swagplay"] < 2 and mv & {"foulplay", "swagger"}:
            s["swagplay"] += 1

    tags = set()
    for w in ("rain", "sun", "sand", "hail"):
        if weather[w] > 1:
            tags.add(w)
    if len(tags) == 4:
        tags.add("allweather")
    elif len(tags) > 1:
        tags.add("multiweather")
    elif len(tags) == 0:
        tags.add("weatherless")
    if s["batonpass"] > 1:
        tags.add("batonpass")
    if s["tailwind"] > 1:
        tags.add("tailwind")
    trickroom = s["trickroom"] > 2 or (s["trickroom"] > 1 and s["slow"] > 1)
    if trickroom:
        tags.add("trickroom")
        for w in ("rain", "sun", "sand", "hail"):
            if weather[w] > 1:
                tags.add(f"trick{w}")
    if s["gravity"] > 2 or (s["gravity"] > 1 and s["gravityMoves"] > 1):
        tags.add("gravity")
    if s["voltturn"] > 2 and s["batonpass"] < 2:
        tags.add("voltturn")
    if s["dragons"] > 1 and s["trappers"] > 0:
        tags.add("dragmag")
    if s["trappers"] > 2:
        tags.add("trapper")
    if s["fear"] > 2 and s["clearance"] > 1:
        tags.add("fear")
        if weather["sand"] > 1:
            tags.add("sandfear")
        if weather["hail"] > 1:
            tags.add("hailfear")
        if trickroom:
            tags.add("trickfear")
    if s["choice"] > 3:
        tags.add("choice")
    if s["swagplay"] > 1:
        tags.add("swagplay")
    if possible_types:
        tags.add("monotype")
        for t in possible_types:
            tags.add(f"mono{t.lower()}")
    single = not (tags & {"multiweather", "allweather", "weatherless"})
    if stalliness <= -1:
        tags.add("hyperoffense")
        if single:
            if "rain" in tags:
                tags.add("rainoffense")
            elif "sun" in tags:
                tags.add("sunoffense")
            elif "sand" in tags:
                tags.add("sandoffense")
            else:
                tags.add("hailoffense")
    elif stalliness < 0:
        tags.add("offense")
    elif stalliness < 1.0:
        tags.add("balance")
    elif stalliness < LOG3_LOG2:
        tags.add("semistall")
    else:
        tags.add("stall")
        if single:
            if "rain" in tags:
                tags.add("rainstall")
            elif "sun" in tags:
                tags.add("sunstall")
            elif "sand" in tags:
                tags.add("sandstall")
            else:
                tags.add("hailstall")
    return sorted(tags)


def classify_team(gen: int, team: list[dict]) -> tuple[int, float, list[str]]:
    """classifyTeam(legacy=true) — classifier.ts:11-54; classification
    runs over the REAL mons only (the 'empty' padding is added after,
    parser.ts:92-106)."""
    real = [m for m in team if m["species"] != "empty"]
    bias = 0
    stals = []
    for mon in real:
        b, st = classify_pokemon(gen, mon)
        bias += b
        stals.append(st)
    stalliness = sum(stals) / len(stals)
    return bias, stalliness, tag(gen, real, stalliness)
