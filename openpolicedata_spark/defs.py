"""Canonical definitions: data types, table types, standardized column names,
and output category vocabularies.

Parity target: /root/reference/openpolicedata/defs.py — DataType (defs.py:22),
TableType (defs.py:59), sentinels MULTI/NA (defs.py:290-291), standardized
column names `_Columns` (defs.py:360-397), category vocabularies `_Races`
(defs.py:458), `_Ethnicities` (defs.py:477), `_Genders` (defs.py:527),
`_PersonTypes` (defs.py:558).

Everything here is pure data — no pandas, no Spark — so it is cheap to ship to
executors inside closures and to compile into Column expressions.
"""

from __future__ import annotations

from enum import Enum


class DataType(str, Enum):
    """Supported source kinds (reference defs.py:22-56) plus Spark-native
    additions (PARQUET; the reference only round-trips parquet as a save
    format, here it is a first-class scan)."""

    ARCGIS = "ArcGIS"
    CARTO = "Carto"
    CKAN = "CKAN"
    CSV = "CSV"
    EXCEL = "Excel"
    HTML = "HTML"
    OPENDATASOFT = "Opendatasoft"
    SOCRATA = "Socrata"
    # Spark-native extensions
    PARQUET = "Parquet"
    JSON = "JSON"


class TableType(str, Enum):
    """Categories of police data tables (reference defs.py:59-287)."""

    ARRESTS = "ARRESTS"
    CALLS_FOR_SERVICE = "CALLS FOR SERVICE"
    CITATIONS = "CITATIONS"
    COMPLAINTS = "COMPLAINTS"
    COMPLAINTS_ALLEGATIONS = "COMPLAINTS - ALLEGATIONS"
    COMPLAINTS_BACKGROUND = "COMPLAINTS - BACKGROUND"
    COMPLAINTS_BODY_WORN_CAMERA = "COMPLAINTS - BODY WORN CAMERA"
    COMPLAINTS_SUBJECTS = "COMPLAINTS - SUBJECTS"
    COMPLAINTS_SUBJECTS_OFFICERS = "COMPLAINTS - SUBJECTS/OFFICERS"
    COMPLAINTS_OFFICERS = "COMPLAINTS - OFFICERS"
    COMPLAINTS_PENALTIES = "COMPLAINTS - PENALTIES"
    CRASHES = "CRASHES"
    CRASHES_SUBJECTS = "CRASHES - SUBJECTS"
    CRASHES_INCIDENTS = "CRASHES - INCIDENTS"
    CRASHES_NONMOTORIST = "CRASHES - NONMOTORIST"
    CRASHES_VEHICLES = "CRASHES - VEHICLES"
    DEATHS_IN_CUSTODY = "DEATHS IN CUSTODY"
    DISCIPLINARY_RECORDS = "DISCIPLINARY RECORDS"
    EMPLOYEE = "EMPLOYEE"
    FIELD_CONTACTS = "FIELD CONTACTS"
    INCIDENTS = "INCIDENTS"
    INCIDENTS_INCIDENTS = "INCIDENTS - INCIDENTS"
    INCIDENTS_SUBJECTS = "INCIDENTS - SUBJECTS"
    LAWSUITS = "LAWSUITS"
    PEDESTRIAN_STOPS = "PEDESTRIAN STOPS"
    PEDESTRIAN_ARRESTS = "PEDESTRIAN ARRESTS"
    PEDESTRIAN_CITATIONS = "PEDESTRIAN CITATIONS"
    PEDESTRIAN_WARNINGS = "PEDESTRIAN WARNINGS"
    POINTING_WEAPON = "POINTING WEAPON"
    SEARCHES = "SEARCHES"
    SHOOTINGS = "OFFICER-INVOLVED SHOOTINGS"
    SHOOTINGS_SUBJECTS = "OFFICER-INVOLVED SHOOTINGS - SUBJECTS"
    SHOOTINGS_OFFICERS = "OFFICER-INVOLVED SHOOTINGS - OFFICERS"
    SHOOTINGS_INCIDENTS = "OFFICER-INVOLVED SHOOTINGS - INCIDENTS"
    STOPS = "STOPS"
    STOPS_INCIDENTS = "STOPS - INCIDENTS"
    STOPS_SUBJECTS = "STOPS - SUBJECTS"
    TRAFFIC = "TRAFFIC STOPS"
    TRAFFIC_INCIDENTS = "TRAFFIC STOPS - INCIDENTS"
    TRAFFIC_SUBJECTS = "TRAFFIC STOPS - SUBJECTS"
    TRAFFIC_ARRESTS = "TRAFFIC ARRESTS"
    TRAFFIC_CITATIONS = "TRAFFIC CITATIONS"
    TRAFFIC_WARNINGS = "TRAFFIC WARNINGS"
    USE_OF_FORCE = "USE OF FORCE"
    USE_OF_FORCE_ADDITIONAL = "USE OF FORCE - ADDITIONAL"
    USE_OF_FORCE_SUBJECTS = "USE OF FORCE - SUBJECTS"
    USE_OF_FORCE_OFFICERS = "USE OF FORCE - OFFICERS"
    USE_OF_FORCE_INCIDENTS = "USE OF FORCE - INCIDENTS"
    USE_OF_FORCE_SUBJECTS_OFFICERS = "USE OF FORCE - SUBJECTS/OFFICERS"
    VEHICLE_PURSUITS = "VEHICLE PURSUITS"
    WARNINGS = "WARNINGS"
    # Local synthetic-data table types (testdata star schema)
    OTHER = "OTHER"


# Catalog sentinels (reference defs.py:290-291)
MULTI = "MULTIPLE"  # dataset contains multiple years / agencies
NA = "NONE"  # not applicable
UNSPECIFIED = "UNSPECIFIED"


class Columns:
    """Standardized output column names (reference defs.py:360-397)."""

    DATE = "DATE"
    TIME = "TIME"
    DATETIME = "DATETIME"
    DATE_PRECISION = "DATE_PRECISION"  # Spark-side companion for pd.Period
    RACE_SUBJECT = "SUBJECT_RACE"
    RACE_ETHNICITY_SUBJECT = "SUBJECT_RACE/ETHNICITY"
    ETHNICITY_SUBJECT = "SUBJECT_ETHNICITY"
    RACE_OFFICER = "OFFICER_RACE"
    RACE_ETHNICITY_OFFICER = "OFFICER_RACE/ETHNICITY"
    ETHNICITY_OFFICER = "OFFICER_ETHNICITY"
    ETHNICITY_OFF_SUB = "OFFICER/SUBJECT_ETHNICITY"
    RACE_OFF_SUB = "OFFICER/SUBJECT_RACE"
    RACE_ETHNICITY_OFF_SUB = "OFFICER/SUBJECT_RACE/ETHNICITY"
    AGENCY = "AGENCY"
    AGE_SUBJECT = "SUBJECT_AGE"
    AGE_OFFICER = "OFFICER_AGE"
    AGE_OFF_SUB = "OFFICER/SUBJECT_AGE"
    AGE_RANGE_SUBJECT = "SUBJECT_AGE_RANGE"
    AGE_RANGE_OFFICER = "OFFICER_AGE_RANGE"
    AGE_RANGE_OFF_SUB = "OFFICER/SUBJECT_AGE_RANGE"
    GENDER_SUBJECT = "SUBJECT_GENDER"
    GENDER_OFFICER = "OFFICER_GENDER"
    GENDER_OFF_SUB = "OFFICER/SUBJECT_GENDER"
    RE_GROUP_OFFICER = "OFFICER_RE_GROUP"
    RE_GROUP_SUBJECT = "SUBJECT_RE_GROUP"
    RE_GROUP_OFF_SUB = "OFFICER/SUBJECT_RE_GROUP"
    SUBJECT_OR_OFFICER = "SUBJECT_OR_OFFICER"
    FATAL_SUBJECT = "SUBJECT_FATAL"
    FATAL_OFFICER = "OFFICER_FATAL"
    FATAL_OFF_SUB = "OFFICER/SUBJECT_FATAL"
    INCIDENT_ID = "INCIDENT_ID"
    INJURY_SUBJECT = "SUBJECT_INJURY"
    INJURY_OFFICER = "OFFICER_INJURY"
    INJURY_OFF_SUB = "OFFICER/SUBJECT_INJURY"
    NAME_SUBJECT = "SUBJECT_NAME"
    NAME_OFFICER = "OFFICER_NAME"
    NAME_OFF_SUB = "OFFICER/SUBJECT_NAME"
    FIREARM_SUBJECT = "SUBJECT_FIREARM_USED"
    FIREARM_OFFICER = "OFFICER_FIREARM_USED"
    FIREARM_OFF_SUB = "OFFICER/SUBJECT_FIREARM_USED"
    ZIP_CODE = "ZIP_CODE"

    @classmethod
    def to_dict(cls) -> dict[str, str]:
        return {
            k: v
            for k, v in vars(cls).items()
            if not k.startswith("_") and isinstance(v, str)
        }


columns = Columns


class Race:
    """Canonical race categories (reference defs.py:458-474)."""

    AAPI = "AAPI"
    ASIAN = "ASIAN"
    BLACK = "BLACK"
    INDIGENOUS = "INDIGENOUS"
    LATINO = "LATINO"
    MIDDLE_EASTERN = "MIDDLE_EASTERN"
    MIDDLE_EASTERN_SOUTH_ASIAN = "MIDDLE_EASTERN_SOUTH_ASIAN"
    MULTIPLE = "MULTIPLE"
    OTHER = "OTHER"
    OTHER_UNKNOWN = "OTHER / UNKNOWN"
    PACIFIC_ISLANDER = "PACIFIC_ISLANDER"
    SOUTH_ASIAN = "SOUTH_ASIAN"
    UNKNOWN = "UNKNOWN"
    UNSPECIFIED = "UNSPECIFIED"
    WHITE = "WHITE"


class Ethnicity:
    """Canonical ethnicity categories (reference defs.py:477-483)."""

    LATINO = "LATINO"
    NONLATINO = "NON-LATINO"
    MIDDLE_EASTERN = "MIDDLE_EASTERN"
    UNKNOWN = "UNKNOWN"
    UNSPECIFIED = "UNSPECIFIED"


class Gender:
    """Canonical gender categories (reference defs.py:527-539)."""

    MALE = "MALE"
    FEMALE = "FEMALE"
    TRANSGENDER_MALE = "TRANSGENDER_MALE"
    TRANSGENDER_FEMALE = "TRANSGENDER_FEMALE"
    TRANSGENDER = "TRANSGENDER"
    GENDER_NONCONFORMING = "GENDER_NONCONFORMING"
    TRANSGENDER_OR_GENDER_NONCONFORMING = "TRANSGENDER_OR_GENDER_NONCONFORMING"
    GENDER_NONBINARY = "GENDER_NONBINARY"
    OTHER = "OTHER"
    UNKNOWN = "UNKNOWN"
    UNSPECIFIED = "UNSPECIFIED"
    UNSPECIFIED_OR_ANOTHER = "UNSPECIFIED_OR_ANOTHER_GENDER_IDENTITY"


class Injury:
    """Canonical injury categories (reference _converters.py:773-851 outputs)."""

    FATAL = "FATAL"
    INJURED = "INJURED"
    NO_INJURY = "NO INJURY"
    SELF_INFLICTED_FATAL = "SELF-INFLICTED FATAL"
    SELF_INFLICTED_INJURED = "SELF-INFLICTED INJURED"
    UNKNOWN = "UNKNOWN"
    UNSPECIFIED = "UNSPECIFIED"


class Fatal:
    """Canonical fatal categories (reference _converters.py:853-881 outputs)."""

    YES = "YES"
    NO = "NO"
    SELF_INFLICTED = "SELF-INFLICTED FATAL"
    UNKNOWN = "UNKNOWN"
    UNSPECIFIED = "UNSPECIFIED"


class PersonType:
    """SUBJECT_OR_OFFICER values (reference defs.py:558-561)."""

    OFFICER = "OFFICER"
    SUBJECT = "SUBJECT"
    UNSPECIFIED = "UNSPECIFIED"


# US states recognized in the catalog (reference defs.py:294 `states`).
STATES = {
    "Alabama", "Alaska", "Arizona", "Arkansas", "California", "Colorado",
    "Connecticut", "Delaware", "District of Columbia", "Florida", "Georgia",
    "Hawaii", "Idaho", "Illinois", "Indiana", "Iowa", "Kansas", "Kentucky",
    "Louisiana", "Maine", "Maryland", "Massachusetts", "Michigan",
    "Minnesota", "Mississippi", "Missouri", "Montana", "Nebraska", "Nevada",
    "New Hampshire", "New Jersey", "New Mexico", "New York",
    "North Carolina", "North Dakota", "Ohio", "Oklahoma", "Oregon",
    "Pennsylvania", "Rhode Island", "South Carolina", "South Dakota",
    "Tennessee", "Texas", "Utah", "Vermont", "Virginia", "Washington",
    "West Virginia", "Wisconsin", "Wyoming",
}


# --------------------------------------------------------------------------
# Category-dict getters (reference defs.py:565-591): the user-facing API
# for building custom category dicts to pass into standardization
# (Table.standardize(race_cats=..., eth_cats=..., gender_cats=...)).
# Keys are the canonical category constants; values are display labels
# (full, or one-letter/compact with compact=True), mirroring the
# reference's _Label(full, compact) tables at defs.py:491-556.
# --------------------------------------------------------------------------

def _ns_copy(cls):
    """Mutation-safe attribute namespace (reference returns deepcopies)."""
    from types import SimpleNamespace

    return SimpleNamespace(**{k: v for k, v in vars(cls).items()
                              if not k.startswith("_") and isinstance(v, str)})


def get_roles():
    return _ns_copy(PersonType)


def get_race_keys():
    return _ns_copy(Race)


def get_eth_keys():
    return _ns_copy(Ethnicity)


def get_gender_keys():
    return _ns_copy(Gender)


_RACE_CATS_BASIC = {
    Race.AAPI: ("ASIAN/PACIFIC ISLANDER", "AAPI"),
    Race.ASIAN: ("ASIAN", "A"),
    Race.BLACK: ("BLACK", "B"),
    Race.LATINO: ("HISPANIC/LATINO", "H"),
    Race.MULTIPLE: ("MULTIPLE", "MULTIPLE"),
    Race.INDIGENOUS: ("INDIGENOUS", "I"),
    Race.OTHER: ("OTHER", "O"),
    Race.OTHER_UNKNOWN: ("OTHER OR UNKNOWN", "OTHER OR UNKNOWN"),
    Race.UNKNOWN: ("UNKNOWN", "UNKNOWN"),
    Race.UNSPECIFIED: ("UNSPECIFIED", "UNSPECIFIED"),
    Race.WHITE: ("WHITE", "W"),
}

_RACE_CATS_EXPANDED = {
    **_RACE_CATS_BASIC,
    Race.PACIFIC_ISLANDER: ("HAWAIIAN/PACIFIC ISLANDER", "H/PI"),
    Race.MIDDLE_EASTERN: ("MIDDLE EASTERN", "ME"),
    Race.MIDDLE_EASTERN_SOUTH_ASIAN: ("MIDDLE EASTERN/SOUTH ASIAN", "ME/SA"),
    Race.SOUTH_ASIAN: ("SOUTH ASIAN", "SA"),
}

_ETH_CATS = {
    Ethnicity.LATINO: ("HISPANIC/LATINO", "H"),
    Ethnicity.MIDDLE_EASTERN: ("MIDDLE EASTERN", "ME"),
    Ethnicity.NONLATINO: ("NON-HISPANIC/NON-LATINO", "NH"),
    Ethnicity.UNKNOWN: ("UNKNOWN", "UNKNOWN"),
    Ethnicity.UNSPECIFIED: ("UNSPECIFIED", "UNSPECIFIED"),
}

_GENDER_CATS = {
    Gender.MALE: ("MALE", "M"),
    Gender.FEMALE: ("FEMALE", "F"),
    Gender.TRANSGENDER_MALE: ("TRANSGENDER MALE", "TM"),
    Gender.TRANSGENDER_FEMALE: ("TRANSGENDER FEMALE", "TF"),
    Gender.TRANSGENDER: ("TRANSGENDER", "T"),
    Gender.GENDER_NONCONFORMING: ("GENDER NON-CONFORMING", "GNC"),
    Gender.TRANSGENDER_OR_GENDER_NONCONFORMING:
        ("TRANSGENDER OR GENDER NON-CONFORMING", "T/GNC"),
    Gender.GENDER_NONBINARY: ("GENDER NON-BINARY", "GNB"),
    Gender.OTHER: ("OTHER", "O"),
    Gender.UNKNOWN: ("UNKNOWN", "UNKNOWN"),
    Gender.UNSPECIFIED: ("UNSPECIFIED", "UNSPECIFIED"),
    Gender.UNSPECIFIED_OR_ANOTHER:
        ("UNSPECIFIED_OR_ANOTHER_GENDER_IDENTITY", "X"),
}


def _cats(table: dict, compact: bool) -> dict:
    out = {k: (v[1] if compact else v[0]) for k, v in table.items()}
    if len(out) != len(set(out.values())):
        # a bare assert would vanish under `python -O`, silently allowing
        # duplicate display labels in user-provided category tables
        dupes = sorted({v for v in out.values()
                        if list(out.values()).count(v) > 1})
        raise ValueError(f"duplicate category labels: {dupes}")
    return out


def get_race_cats(expand: bool = False, compact: bool = False) -> dict:
    return _cats(_RACE_CATS_EXPANDED if expand else _RACE_CATS_BASIC, compact)


def get_eth_cats(compact: bool = False) -> dict:
    return _cats(_ETH_CATS, compact)


def get_gender_cats(compact: bool = False) -> dict:
    return _cats(_GENDER_CATS, compact)
