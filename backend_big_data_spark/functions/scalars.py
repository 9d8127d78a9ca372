"""Scalar column expressions (SURVEY.md §2.8-2.9).

Everything here is a pure Catalyst column expression — codegen-able, no
Python UDFs. The reference's only scalar UDF (F1, ``flickrapi_utils.py:28-31``
— a string-format URL builder re-registered per call at ``queries.py:325-330``)
becomes ``format_string``; its driver-side haversine (``mlqueries.py:77-83``)
becomes trig column math so it can run distributed over any row count.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km as a column expression.

    Replaces the reference's pure-Python double loop over centroids×monuments
    (``mlqueries.py:120-137``) — as a column expr it distributes and stays in
    whole-stage codegen.
    """
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.atan2(F.sqrt(a), F.sqrt(1 - a))


def photo_url(farm: Column, server: Column, photo_id: Column, secret: Column) -> Column:
    """Flickr-style photo URL — reference UDF F1 (``flickrapi_utils.py:28-31``)
    replaced with a built-in ``format_string`` (JVM-side, codegen-able)."""
    return F.format_string(
        "https://farm%s.staticflickr.com/%s/%s_%s.jpg", farm, server, photo_id, secret
    )


#: Fallback buddy icon the reference returns when a user has no custom one
#: (``flickrapi_utils.py:23``).
DEFAULT_AVATAR = "https://www.flickr.com/images/buddyicon.gif"


def avatar_url(user_id: Column, icon_farm: Column, icon_server: Column) -> Column:
    """Buddy-icon URL — reference UDF F2 (``flickrapi_utils.py:7-25``) makes a
    per-row HTTP call to fetch (iconfarm, iconserver) and then string-formats
    the URL. The engine precomputes the icon fields at ingest (they already
    live in ``owner.iconFarm/iconServer`` in the data model), so the network
    hop collapses into a pure ``format_string`` column expression with the
    reference's truthiness fallback (farm/server null or 0 → default icon).
    """
    have_icon = (
        icon_farm.isNotNull()
        & icon_server.isNotNull()
        & (icon_farm != F.lit(0))
        & (icon_server != F.lit(0))
    )
    return F.when(
        have_icon,
        F.format_string(
            "https://farm%s.staticflickr.com/%s/buddyicons/%s.jpg",
            icon_farm,
            icon_server,
            user_id,
        ),
    ).otherwise(F.lit(DEFAULT_AVATAR))


def bucketize(col: Column, thresholds: list[float], labels: list[str]) -> Column:
    """Conditional bucketing — reference P12 ``when/otherwise`` chains
    (``data_cleaner.py:87-93``) generalized: len(labels) == len(thresholds)+1,
    value < thresholds[i] → labels[i], else last label."""
    if len(labels) != len(thresholds) + 1:
        raise ValueError("need len(labels) == len(thresholds) + 1")
    expr = F.lit(labels[-1])
    for t, lab in zip(reversed(thresholds), reversed(labels[:-1])):
        expr = F.when(col < F.lit(t), F.lit(lab)).otherwise(expr)
    return expr


def round_half_up(col: Column, scale: int) -> Column:
    """Cross-engine-deterministic rounding: ``floor(x·10^s + 0.5)/10^s``.

    ``F.round`` and other engines' ROUND disagree on ties for doubles
    (half-up vs banker's vs decimal-expansion-of-the-binary-value) — a mean
    of a small group of low-decimal values lands exactly on the grid often
    enough to break hash parity. This form is plain double arithmetic, so
    any IEEE-754 engine evaluating the same expression gets the identical
    bit pattern. (Half-up toward +∞ for negatives; fine for magnitudes.)
    """
    factor = float(10**scale)
    return F.floor(col * factor + F.lit(0.5)) / factor
