#!/usr/bin/env python
"""Generate the deterministic photo-domain fixture parquet.

The reference's entire serving surface runs over one photos table
(``main.py:142-148``); the driver's synthetic catalog has no such table, so
the photo-domain queries need their own stable fixture to be oracle-checked
like everything else. This script writes ``tests/data/photos.parquet`` —
2,000 seeded rows in the corrected photo schema (SURVEY.md §1.3: ``tags`` as
``array<struct<count:int,value:string>>``, dates as ISO-8601 strings with a
``+00:00`` offset exactly like the source JSON) — via pyarrow so the file is
byte-stable given the same library versions.

Distributions deliberately exercise the §2.13 semantics: null dates/views/
comments (A12 null groups), sentinel camera make/model rows (B5), empty and
null tag arrays (P14), two geo blobs + null geoData, and shared keywords in
titles vs tags so search union+dedup (U1/B10) has overlap.

Run: ``python tools/gen_photo_fixture.py`` (idempotent, overwrites).
"""

from __future__ import annotations

import datetime
import random
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

OUT = Path(__file__).resolve().parents[1] / "tests" / "data" / "photos.parquet"

MAKE_SENTINEL = "Marca fotocamera non disponibile"
MODEL_SENTINEL = "Modello fotocamera non disponibile"

MAKES = {
    "Canon": ["EOS R5", "EOS 90D", "PowerShot G7", "EOS M50"],
    "Nikon": ["D500", "Z6", "D3500", "Coolpix P1000"],
    "Sony": ["A7 III", "A6400", "RX100"],
    "Fujifilm": ["X-T4", "X100V"],
    "Olympus": ["OM-D E-M10", "PEN E-PL10"],
    "Leica": ["Q2", "M10"],
}

TAG_VOCAB = [
    "rome", "sunset", "colosseo", "italy", "travel", "architecture",
    "street", "night", "vatican", "trastevere", "food", "art", "museum",
    "river", "bridge", "fountain", "piazza", "church", "ruins", "sky",
    "clouds", "portrait", "landscape", "blackandwhite", "summer", "winter",
    "spring", "autumn", "rain", "light", "shadow", "people", "market",
    "train", "bike", "cat", "dog", "tree", "flower", "moon",
]

TITLE_WORDS = [
    "morning", "golden", "sunset", "walk", "rome", "hidden", "alley",
    "view", "from", "the", "hill", "ancient", "stones", "quiet", "crowd",
    "light", "rain", "reflections", "last", "tram",
]


def _iso(dt: datetime.datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + ".000+00:00"


def build_rows(n: int = 2000, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    owners = []
    for i in range(150):
        owners.append(
            {
                "admin": False,
                "bandwidthMax": 0,
                "bandwidthUsed": 0,
                "filesizeMax": 0,
                "iconFarm": rng.randint(1, 9),
                "iconServer": rng.randint(1, 9999),
                "id": f"{10000000 + i}@N0{i % 10}",
                "photosCount": rng.randint(0, 5000),
                "pro": (i % 7 == 0),
                "revContact": False,
                "revFamily": False,
                "revFriend": False,
                "username": f"user_{i:03d}",
            }
        )
    # Zipf-ish tag weights: heavy head, long tail.
    tag_weights = [1.0 / (k + 1) for k in range(len(TAG_VOCAB))]

    epoch0 = datetime.datetime(2019, 1, 1)
    span_s = int((datetime.datetime(2024, 1, 1) - epoch0).total_seconds())

    rows = []
    for i in range(n):
        owner = owners[rng.randrange(len(owners))]
        posted_dt = epoch0 + datetime.timedelta(seconds=rng.randrange(span_s))
        taken_dt = posted_dt - datetime.timedelta(
            minutes=rng.randint(1, 60 * 24 * 30)
        )
        posted = None if rng.random() < 0.02 else _iso(posted_dt)
        taken = None if rng.random() < 0.02 else _iso(taken_dt)

        if rng.random() < 0.06:
            make, model = MAKE_SENTINEL, MODEL_SENTINEL
        else:
            make = rng.choice(list(MAKES))
            model = rng.choice(MAKES[make])

        if rng.random() < 0.05:
            geo = None
        else:
            if rng.random() < 0.65:
                lat, lon = 41.9 + rng.uniform(-0.05, 0.05), 12.5 + rng.uniform(-0.05, 0.05)
            else:
                lat, lon = 45.46 + rng.uniform(-0.05, 0.05), 9.19 + rng.uniform(-0.05, 0.05)
            geo = {
                "accuracy": rng.randint(1, 16),
                "latitude": round(lat, 6),
                "longitude": round(lon, 6),
            }

        if rng.random() < 0.03:
            tags = None
        else:
            k = rng.randint(0, 5)
            chosen = []
            seen = set()
            while len(chosen) < k:
                t = rng.choices(TAG_VOCAB, weights=tag_weights)[0]
                if t not in seen:
                    seen.add(t)
                    chosen.append({"count": rng.randint(1, 40), "value": t})
            tags = chosen

        views = (
            None
            if rng.random() < 0.05
            else (rng.randint(5000, 100000) if rng.random() < 0.15 else rng.randint(0, 5000))
        )
        comments = None if rng.random() < 0.08 else rng.randint(0, 50)

        rows.append(
            {
                "camera_info": {"make": make, "model": model},
                "comments": comments,
                "datePosted": posted,
                "dateTaken": taken,
                "familyFlag": rng.random() < 0.1,
                "farm": str(rng.randint(1, 9)),
                "favorite": rng.random() < 0.2,
                "geoData": geo,
                "hasPeople": rng.random() < 0.3,
                "id": f"{52000000000 + i}",
                "license": str(rng.randint(0, 10)),
                "owner": owner,
                "publicFlag": rng.random() < 0.95,
                "secret": f"{rng.randrange(16**10):010x}",
                "server": str(rng.randint(60000, 66000)),
                "tags": tags,
                "title": " ".join(
                    rng.choices(TITLE_WORDS, k=rng.randint(2, 6))
                ),
                "views": views,
            }
        )
    return rows


def arrow_schema() -> pa.Schema:
    return pa.schema(
        [
            pa.field(
                "camera_info",
                pa.struct([("make", pa.string()), ("model", pa.string())]),
            ),
            pa.field("comments", pa.int32()),
            pa.field("datePosted", pa.string()),
            pa.field("dateTaken", pa.string()),
            pa.field("familyFlag", pa.bool_()),
            pa.field("farm", pa.string()),
            pa.field("favorite", pa.bool_()),
            pa.field(
                "geoData",
                pa.struct(
                    [
                        ("accuracy", pa.int32()),
                        ("latitude", pa.float64()),
                        ("longitude", pa.float64()),
                    ]
                ),
            ),
            pa.field("hasPeople", pa.bool_()),
            pa.field("id", pa.string()),
            pa.field("license", pa.string()),
            pa.field(
                "owner",
                pa.struct(
                    [
                        ("admin", pa.bool_()),
                        ("bandwidthMax", pa.int32()),
                        ("bandwidthUsed", pa.int32()),
                        ("filesizeMax", pa.int32()),
                        ("iconFarm", pa.int32()),
                        ("iconServer", pa.int32()),
                        ("id", pa.string()),
                        ("photosCount", pa.int32()),
                        ("pro", pa.bool_()),
                        ("revContact", pa.bool_()),
                        ("revFamily", pa.bool_()),
                        ("revFriend", pa.bool_()),
                        ("username", pa.string()),
                    ]
                ),
            ),
            pa.field("publicFlag", pa.bool_()),
            pa.field("secret", pa.string()),
            pa.field("server", pa.string()),
            pa.field(
                "tags",
                pa.list_(
                    pa.struct([("count", pa.int32()), ("value", pa.string())])
                ),
            ),
            pa.field("title", pa.string()),
            pa.field("views", pa.int32()),
        ]
    )


def main() -> None:
    rows = build_rows()
    table = pa.Table.from_pylist(rows, schema=arrow_schema())
    OUT.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, OUT, compression="snappy")
    print(f"wrote {OUT} rows={table.num_rows} bytes={OUT.stat().st_size}")


if __name__ == "__main__":
    main()
