"""Exception hierarchy mirroring the reference's public error surface
(reference exceptions.py:2-76) so code written against openpolicedata can
catch the same classes here.

Each class also inherits the builtin exception this package raised before
the hierarchy existed (ValueError / RuntimeError), so both
`except OPD_MinVersionError` (reference style) and `except ValueError`
(pre-existing callers) keep working.
"""

from __future__ import annotations


class OPD_GeneralError(Exception):
    """Base class (reference exceptions.py:2-38)."""


class OPD_DataUnavailableError(OPD_GeneralError, RuntimeError):
    """Remote portal cannot serve the request (reference :41-42)."""


class OPD_TooManyRequestsError(OPD_GeneralError, RuntimeError):
    """Rate-limited by the portal (HTTP 429; reference :44-45)."""


class OPD_MultipleErrors(OPD_GeneralError):
    """Several loaders failed in one combined request (reference :47-48)."""


class OPD_arcgisAuthInfoError(OPD_GeneralError, RuntimeError):
    """ArcGIS auth/token failure (reference :50-51)."""


class OPD_SocrataHTTPError(OPD_GeneralError, RuntimeError):
    """Socrata HTTP failure (reference :53-54)."""


class OPD_FutureError(OPD_GeneralError, NotImplementedError):
    """Declared but not-yet-implemented path (reference :56-57)."""


class OPD_MinVersionError(OPD_GeneralError, ValueError):
    """Catalog row requires a newer library version (reference :59-60)."""


class AutoMergeError(OPD_GeneralError, ValueError):
    """Incident-ID key auto-detection failed (reference :62-63)."""


class BadCategoryDict(OPD_GeneralError, ValueError):
    """User category dict has unknown keys (reference :65-66)."""


class DateFilterException(OPD_GeneralError, ValueError):
    """Unusable date filter input (reference :68-69)."""


class MultiAgencySourceError(OPD_GeneralError, ValueError):
    """Source spans multiple states/agencies without disambiguation
    (reference :74-75)."""
