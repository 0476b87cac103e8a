"""Value-standardization LUTs compiled to Column expressions.

Parity target: /root/reference/openpolicedata/_converters.py — race LUT
(:293-617), ethnicity (:233-290), gender (:620-770), age-range (:146-230),
injury (:773-851), fatal (:853-881), firearm (:884-905), role (:129-143).

Architecture: the reference applies Python dict/regex lookups row-by-row via
``Series.apply``. Here each LUT is *compiled once* on the driver into a
Column expression:

    exact-code map  →  F.element_at(F.create_map([...literals...]), key)
    pattern family  →  F.when(col.rlike(...), category) chain
    no_id fallback  →  keep original / null / sentinel

The compiled expression is pure Catalyst — whole-stage codegen applies, no
Python in the executor path, and the map literals ship with the plan (they
are tiny). Per-source quirk codes live in declarative tables keyed by
source_name, mirroring the reference's per-source dict branches.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from openpolicedata_spark.defs import Ethnicity, Fatal, Gender, Injury, PersonType, Race

# --------------------------------------------------------------------------
# generic compiler
# --------------------------------------------------------------------------


def compile_lut(
    col: Column,
    exact: Optional[dict[str, str]] = None,
    patterns: Optional[list[tuple[str, str]]] = None,
    no_id: str = "keep",
    upper: bool = True,
    trim: bool = True,
) -> Column:
    """Compile (exact-code dict, [(regex, category)] pattern family, no_id
    fallback) into one Column expression.

    ``no_id`` ∈ {'keep', 'null', 'error'} mirrors the reference's fallback
    modes (_converters.py:56-70): keep the original value, null it, or — in
    'error' mode — emit the sentinel that the caller's validation step
    raises on (raising from a distributed expression is done by a checked
    assert_true at action time).
    """
    key = col.cast("string")
    if trim:
        key = F.trim(key)
    if upper:
        key = F.upper(key)

    expr = None
    if exact:
        kv = []
        for k, v in exact.items():
            kv.extend([F.lit(k.upper() if upper else k), F.lit(v)])
        expr = F.element_at(F.create_map(*kv), key)

    pattern_expr = None
    if patterns:
        for rx, category in patterns:
            cond = key.rlike(rx)
            pattern_expr = (
                F.when(cond, F.lit(category))
                if pattern_expr is None
                else pattern_expr.when(cond, F.lit(category))
            )

    if expr is not None and pattern_expr is not None:
        matched = F.coalesce(expr, pattern_expr)
    else:
        matched = expr if expr is not None else pattern_expr
    if matched is None:
        matched = F.lit(None).cast("string")

    if no_id == "keep":
        fallback = col.cast("string")
    elif no_id == "null":
        fallback = F.lit(None).cast("string")
    elif no_id == "error":
        fallback = F.lit("__NO_ID_ERROR__")
    else:
        raise ValueError(f"no_id must be keep|null|error, got {no_id!r}")

    return F.when(col.isNull(), F.lit(None)).otherwise(F.coalesce(matched, fallback))


# --------------------------------------------------------------------------
# race (reference _converters.py:293-617)
# --------------------------------------------------------------------------

# Per-source letter codes (declarative port of the per-source dict branches,
# _converters.py:360-431). Keys uppercased.
SOURCE_RACE_CODES: dict[str, dict[str, str]] = {
    "Austin": {"M": Race.MIDDLE_EASTERN, "P": Race.PACIFIC_ISLANDER,
               "N": Race.INDIGENOUS, "O": Race.OTHER},
    "Washington Post": {"W": Race.WHITE, "B": Race.BLACK, "A": Race.ASIAN,
                        "N": Race.INDIGENOUS, "H": Race.LATINO,
                        "O": Race.OTHER, "--": Race.UNKNOWN},
    "New York City": {"P": Race.BLACK, "Q": Race.WHITE, "X": Race.UNKNOWN,
                      "Z": Race.OTHER},
    "Chicago": {"BLK": Race.BLACK, "WHI": Race.WHITE, "API": Race.AAPI,
                "WBH": Race.BLACK, "WWH": Race.WHITE, "I": Race.INDIGENOUS,
                "U": Race.UNKNOWN, "P": Race.PACIFIC_ISLANDER, "WHT": Race.WHITE},
    "Los Angeles": {"A": Race.ASIAN, "B": Race.BLACK, "C": Race.ASIAN,
                    "D": Race.ASIAN, "F": Race.ASIAN, "G": Race.PACIFIC_ISLANDER,
                    "H": Race.LATINO, "I": Race.INDIGENOUS, "J": Race.ASIAN,
                    "K": Race.ASIAN, "L": Race.ASIAN, "O": Race.OTHER,
                    "P": Race.PACIFIC_ISLANDER, "S": Race.PACIFIC_ISLANDER,
                    "U": Race.PACIFIC_ISLANDER, "V": Race.ASIAN, "W": Race.WHITE,
                    "X": Race.UNKNOWN, "Z": Race.SOUTH_ASIAN},
    "Louisville": {"A": Race.AAPI, "U": Race.UNKNOWN, "IB": Race.SOUTH_ASIAN,
                   "M": Race.MIDDLE_EASTERN, "AN": Race.INDIGENOUS},
    "Charleston": {"A": Race.AAPI, "AI": Race.INDIGENOUS, "AP": Race.AAPI,
                   "BK": Race.BLACK, "MR": Race.MULTIPLE, "AO": Race.OTHER},
}

# Numeric race codes (California RIPA / Lincoln, _converters.py:314-336).
NUMERIC_RACE_CODES: dict[str, dict[str, str]] = {
    "California": {"1": Race.ASIAN, "2": Race.BLACK, "3": Race.LATINO,
                   "4": Race.MIDDLE_EASTERN_SOUTH_ASIAN, "5": Race.INDIGENOUS,
                   "6": Race.PACIFIC_ISLANDER, "7": Race.WHITE, "8": Race.MULTIPLE},
    "Lincoln": {"1": Race.WHITE, "2": Race.BLACK, "3": Race.LATINO,
                "4": Race.ASIAN, "5": Race.INDIGENOUS, "6": Race.OTHER},
}

# Pattern families applied after per-source exact codes
# (_converters.py:434-610, condensed into one ordered rule table).
RACE_PATTERNS: list[tuple[str, str]] = [
    (r"^(W|WHITE|CAUCASIAN|WN|WHITE[ -]NON[ -]?HISPANIC)$", Race.WHITE),
    # anchored BOTH ends like every sibling rule: an open tail made any
    # B-prefixed value BLACK ('BIRACIAL' belongs to MULTI below, 'BLANK'
    # to unspecified; reference _converters.py:502-505 word-bounds BLACK)
    (r"^(B|BLACK|AFRICAN[ -]?AMERICAN|AFR AMERICAN|BLK)$", Race.BLACK),
    (r"^BLACK[^A-Z]", Race.BLACK),
    (r"^(H|HISPANIC|LATINO|LATINA|LATIN|HISPANIC OR LATINO|HIS)$", Race.LATINO),
    (r"(HISPANIC|LATIN)", Race.LATINO),
    (r"^(A|ASIAN|AS)$", Race.ASIAN),
    (r"ASIAN.{0,3}(PACIFIC|PAC).*(ISLANDER|ISL)?|^AAPI$|^API$", Race.AAPI),
    (r"(PACIFIC|HAWAII|SAMOAN|GUAMANIAN)", Race.PACIFIC_ISLANDER),
    (r"^ASIAN", Race.ASIAN),
    (r"(NATIVE AMER|AMERICAN INDIAN|ALASKAN? NATIVE|AMER IND|INDIGENOUS)", Race.INDIGENOUS),
    (r"(MIDDLE EAST)", Race.MIDDLE_EASTERN),
    (r"(ASIAN INDIAN|SOUTH ASIAN|INDIA|BURMESE)", Race.SOUTH_ASIAN),
    (r"(MULTI|BIRACIAL|MIXED|TWO OR MORE)", Race.MULTIPLE),
    (r"^(U|UNK|UNKNOWN|UNDECLARED|--)$", Race.UNKNOWN),
    (r"^(O|OTHER|OTH)$", Race.OTHER),
    (r"OTHER", Race.OTHER),
    (r"^(NOT *(SPECIFIED|STATED|RECORDED|APPLICABLE)|N/?A|NONE|BLANK|)$", Race.UNSPECIFIED),
]


# Census-style aggregation of fine-grained ancestry answers into the
# canonical buckets (reference agg_cat branch, _converters.py:500-560):
# applied BEFORE the standard patterns when agg_cat=True.
AGG_RACE_PATTERNS: list[tuple[str, str]] = [
    (r"(EAST AFRICAN|SOMALI|ETHIOPIAN|ERITREAN|KENYAN|NIGERIAN|GHANAIAN|HAITIAN|JAMAICAN|WEST INDIAN)", Race.BLACK),
    (r"(BOSNIAN|ALBANIAN|RUSSIAN|UKRAIN|POLISH|ITALIAN|IRISH|GERMAN|FRENCH|EUROPEAN)", Race.WHITE),
    (r"(MEXICAN|PUERTO RIC|CUBAN|GUATEMALAN|SALVADORAN|HONDURAN|COLOMBIAN|PERUVIAN|SOUTH AMERICAN|CENTRAL AMERICAN|DOMINICAN)", Race.LATINO),
    (r"(CHINESE|JAPANESE|KOREAN|VIETNAMESE|FILIPINO|CAMBODIAN|LAOTIAN|THAI|HMONG|TAIWANESE)", Race.ASIAN),
    (r"(ARAB|LEBANESE|SYRIAN|EGYPTIAN|IRAQI|IRANIAN|PERSIAN|TURKISH)", Race.MIDDLE_EASTERN),
    (r"(ASIAN INDIAN|PAKISTANI|BANGLADESH|SRI LANKAN|NEPALI)", Race.SOUTH_ASIAN),
]


def race_expr(col: Column, source_name: Optional[str] = None,
              state: Optional[str] = None, no_id: str = "keep",
              agg_cat: bool = False) -> Column:
    """Compile the race LUT for one source into a Column expression
    (reference `_create_race_lut`, _converters.py:293-617). ``agg_cat``
    folds census ancestry answers into the canonical buckets first."""
    exact: dict[str, str] = {}
    if state in NUMERIC_RACE_CODES:
        exact.update(NUMERIC_RACE_CODES[state])
    if source_name in NUMERIC_RACE_CODES:
        exact.update(NUMERIC_RACE_CODES[source_name])
    if source_name in SOURCE_RACE_CODES:
        exact.update(SOURCE_RACE_CODES[source_name])
    patterns = (AGG_RACE_PATTERNS + RACE_PATTERNS) if agg_cat else RACE_PATTERNS
    return compile_lut(col, exact=exact, patterns=patterns, no_id=no_id)


# --------------------------------------------------------------------------
# ethnicity (reference _converters.py:233-290)
# --------------------------------------------------------------------------

ETHNICITY_PATTERNS: list[tuple[str, str]] = [
    (r"^(N|NO|NON[ -]?HISPANIC|NOT HISPANIC.*|NON[ -]?LATINO)$", Ethnicity.NONLATINO),
    (r"^(H|Y|YES|HISPANIC|LATINO|LATINA|HISPANIC OR LATINO)$", Ethnicity.LATINO),
    (r"(HISPANIC|LATIN)", Ethnicity.LATINO),
    (r"MIDDLE EAST", Ethnicity.MIDDLE_EASTERN),
    (r"^(U|UNK|UNKNOWN)$", Ethnicity.UNKNOWN),
    (r"^(NOT *(SPECIFIED|STATED|RECORDED)|N/?A|NONE|)$", Ethnicity.UNSPECIFIED),
]


def ethnicity_expr(col: Column, source_name: Optional[str] = None,
                   no_id: str = "keep") -> Column:
    return compile_lut(col, patterns=ETHNICITY_PATTERNS, no_id=no_id)


# --------------------------------------------------------------------------
# gender (reference _converters.py:620-770)
# --------------------------------------------------------------------------

NUMERIC_GENDER_CODES: dict[str, dict[str, str]] = {
    # California stops data codes (_converters.py:640-652)
    "California": {"1": Gender.MALE, "2": Gender.FEMALE,
                   "3": Gender.TRANSGENDER_MALE, "4": Gender.TRANSGENDER_FEMALE,
                   "5": Gender.GENDER_NONCONFORMING},
    # Lincoln numeric gender codes: reference maps only 1/2
    # (_converters.py Lincoln branch)
    "Lincoln": {"1": Gender.MALE, "2": Gender.FEMALE},
}

GENDER_PATTERNS: list[tuple[str, str]] = [
    (r"^(M|MALE|MAN|CISGENDER MALE)$", Gender.MALE),
    (r"^(F|FEMALE|WOMAN|W|CISGENDER FEMALE)$", Gender.FEMALE),
    (r"TRANSGENDER.*(MAN|MALE)$", Gender.TRANSGENDER_MALE),
    (r"TRANSGENDER.*(WOMAN|FEMALE)$", Gender.TRANSGENDER_FEMALE),
    (r"^TRANSGENDER$", Gender.TRANSGENDER),
    (r"NON.?BINARY", Gender.GENDER_NONBINARY),
    (r"NON.?CONFORMING", Gender.GENDER_NONCONFORMING),
    (r"^(U|UNK|UNKNOWN)$", Gender.UNKNOWN),
    (r"^(OTHER|OTH|X)$", Gender.OTHER),
    (r"^(NOT *(SPECIFIED|STATED|RECORDED)|N/?A|NONE|)$", Gender.UNSPECIFIED),
]


def gender_expr(col: Column, source_name: Optional[str] = None,
                state: Optional[str] = None, no_id: str = "keep") -> Column:
    exact: dict[str, str] = {}
    if state in NUMERIC_GENDER_CODES:
        exact.update(NUMERIC_GENDER_CODES[state])
    if source_name in NUMERIC_GENDER_CODES:
        exact.update(NUMERIC_GENDER_CODES[source_name])
    return compile_lut(col, exact=exact, patterns=GENDER_PATTERNS, no_id=no_id)


# --------------------------------------------------------------------------
# age (reference preproc.py:1988-2151)
# --------------------------------------------------------------------------


def age_expr(col: Column, min_age: int = 1, max_age: int = 120) -> Column:
    """Numeric coercion with outlier nulling (reference preproc.py:2147-2148
    uses nullable Int64 and [1,120] bounds)."""
    n = col.cast("double")
    i = F.round(n).cast("int")
    return F.when(
        n.isNotNull() & (n == i.cast("double")) & (i >= min_age) & (i <= max_age), i
    ).otherwise(F.lit(None).cast("int"))


AGE_RANGE_NORMALIZE: list[tuple[str, str]] = [
    # autocorrect Excel date-ification '17-Oct' → '10-17' handled separately
    (r"^(\d+)\s*(\+|PLUS|AND (UP|OLDER|OVER))$", "$1+"),
    (r"^(OVER|>)\s*(\d+)$", "$2+"),
    (r"^(UNDER|<)\s*(\d+)$", "0-$2"),
    (r"^(\d+)\s*(?:-|–|TO)\s*(\d+)$", "$1-$2"),
    (r"^(\d+)0S$", "$10-$19"),
]


def age_range_expr(col: Column, no_id: str = "keep") -> Column:
    """Normalize age-range strings to 'lo-hi' / 'lo+' (reference
    `_create_age_range_lut`, _converters.py:146-230). Implemented as a
    regexp_replace chain + the month-name autocorrect ('17-Oct' → '10-17',
    an Excel mangling the reference repairs)."""
    months = {"JAN": 1, "FEB": 2, "MAR": 3, "APR": 4, "MAY": 5, "JUN": 6,
              "JUL": 7, "AUG": 8, "SEP": 9, "OCT": 10, "NOV": 11, "DEC": 12}
    s = F.upper(F.trim(col.cast("string")))
    # Excel date-ification: '17-Oct' means the range 10-17.
    month_alt = "|".join(months)
    mnum = F.element_at(
        F.create_map(*[F.lit(x) for kv in months.items() for x in (kv[0], str(kv[1]))]),
        F.regexp_extract(s, rf"^\d+-({month_alt})$", 1),
    )
    day = F.regexp_extract(s, rf"^(\d+)-(?:{month_alt})$", 1)
    s = F.when(
        s.rlike(rf"^\d+-(?:{month_alt})$"), F.concat(mnum, F.lit("-"), day)
    ).otherwise(s)
    for rx, repl in AGE_RANGE_NORMALIZE:
        s = F.regexp_replace(s, rx, repl)
    s = F.regexp_replace(s, r"^(\d+)<=X<(\d+)$", "$1-$2")  # 18<=x<25 style
    known = s.rlike(r"^(\d+-\d+|\d+\+|ADULT|JUVENILE)$")
    if no_id == "keep":
        fb = col.cast("string")
    elif no_id == "null":
        fb = F.lit(None).cast("string")
    else:
        fb = F.lit("__NO_ID_ERROR__")
    return F.when(col.isNull(), F.lit(None)).when(known, s).otherwise(fb)


# --------------------------------------------------------------------------
# injury / fatal / firearm / role
# --------------------------------------------------------------------------

INJURY_PATTERNS: list[tuple[str, str]] = [
    (r"SELF[ -]?INFLICTED.*FATAL|FATAL.*SELF[ -]?INFLICTED", Injury.SELF_INFLICTED_FATAL),
    (r"(FATAL|DECEASED|DEATH|DIED|KILLED)", Injury.FATAL),
    (r"^(NO|N|NONE|NO INJUR.*|NOT INJURED|NO COMPLAINT.*)$", Injury.NO_INJURY),
    (r"(INJUR|WOUND|LACERAT|ABRASION|BRUIS|FRACTUR|GUNSHOT|BLEED|PAIN|BROKEN|"
     r"CONCUSS|TASER|HOSPITAL|TREATED)", Injury.INJURED),
    (r"^(Y|YES)$", Injury.INJURED),
    (r"^(U|UNK|UNKNOWN)$", Injury.UNKNOWN),
    (r"^(NOT *(SPECIFIED|STATED|RECORDED)|N/?A|)$", Injury.UNSPECIFIED),
]


def injury_expr(col: Column, no_id: str = "keep") -> Column:
    """reference `_create_injury_lut` _converters.py:773-851."""
    return compile_lut(col, patterns=INJURY_PATTERNS, no_id=no_id)


FATAL_PATTERNS: list[tuple[str, str]] = [
    (r"SELF", Fatal.SELF_INFLICTED),
    (r"^(Y|YES|1|TRUE|FATAL|DECEASED)$", Fatal.YES),
    (r"^(N|NO|0|FALSE|NON[ -]?FATAL)$", Fatal.NO),
    (r"^(U|UNK|UNKNOWN)$", Fatal.UNKNOWN),
]


def fatal_expr(col: Column, no_id: str = "keep") -> Column:
    """reference `_create_fatal_lut` _converters.py:853-881."""
    return compile_lut(col, patterns=FATAL_PATTERNS, no_id=no_id)


def firearm_expr(col: Column, no_id: str = "keep") -> Column:
    """reference `_create_firearm_lut` _converters.py:884-905."""
    return compile_lut(
        col,
        patterns=[(r"^(Y|YES|1|TRUE|FIREARM.*)$", "YES"),
                  (r"^(N|NO|0|FALSE|NONE)$", "NO")],
        no_id=no_id,
    )


def role_expr(col: Column, no_id: str = "keep") -> Column:
    """reference `convert_off_or_civ` _converters.py:129-143."""
    return compile_lut(
        col,
        patterns=[
            (r"^(OFFICER|OFF|PO|POLICE.*|DEPUTY|LAW ENFORCEMENT.*)$", PersonType.OFFICER),
            (r"^(SUBJECT|CIVILIAN|CITIZEN|SUSPECT|COMMUNITY MEMBER)$", PersonType.SUBJECT),
            (r"^(U|UNK|UNKNOWN|)$", PersonType.UNSPECIFIED),
        ],
        no_id=no_id,
    )
