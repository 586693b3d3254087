"""Generate the committed movies-CSV fixture (FIXTURES.md §1).

Deterministic (seeded) dirty-CSV corpus exercising every ingest trait the
reference defines (SURVEY.md §1.2, /root/reference/Code/dataAnalyze.erl:42-104,
csv_to_ets.erl:19-60): quoted comma titles, ""-escaped quotes, Unicode and
ASCII whitespace around actor tokens, stray quotes around tokens, empty
lines, short (<3 field) rows, non-numeric ids, duplicate titles, an empty
cast field, and engineered probe structures so every level bucket 1..4 of
the two core queries is populated.

SAME-SCALE with the reference: 85,000 movie rows — the reference's own
ingest cap (/root/reference/Code/csv_to_ets.erl:21) — so the BASELINE.md
comparison (1.862 s actor / 3.988 s title on 85k rows across 5 PCs) is
apples-to-apples. The actor pool (20,000 names, cast size 1..10) gives the
hub-actor query a realistic level distribution: the hub joins every 30th
cast (~2,833 movies), so a typical co-actor shares 1-3 movies with it and a
Poisson tail reaches the >=4 cap — all four buckets materially populated
rather than degenerate at the cap.

Run from the repo root: ``python tools/gen_movies_fixture.py``. The output
is committed; regeneration is bit-identical.
"""

from __future__ import annotations

import random
from pathlib import Path

OUT = Path(__file__).resolve().parents[1] / "fixtures" / "movies_dirty.csv"

N_MOVIES = 85_000  # the reference's ingest cap (csv_to_ets.erl:21)
N_ACTORS = 20_000
HUB = "Actor_0001"
HUB_EVERY = 30  # hub joins every 30th cast
NBSP = " "


def actor(i: int) -> str:
    return f"Actor_{i:04d}"


def quote(field: str) -> str:
    return '"' + field.replace('"', '""') + '"'


def main() -> None:
    rng = random.Random(42)
    pool = [actor(i) for i in range(N_ACTORS)]
    lines = ["movie_id,title,actors_csv"]

    for mid in range(1, N_MOVIES + 1):
        title = f"Movie {mid}"
        k = rng.randint(1, 10)
        cast = rng.sample(pool, k)
        # hub actor joins every 30th cast (~2,833 movies) — enough traffic
        # that co-actor counts 1,2,3 and the >=4 cap all occur, without the
        # degenerate everything-at-cap distribution a denser hub would give
        if mid % HUB_EVERY == 0 and HUB not in cast:
            cast[0] = HUB
        # engineered probe-title neighbours ("Movie 10" is the probe):
        # movie 11 shares 5 actors (level 4), movie 12 shares 2 (level 2),
        # movie 13 shares 3 (level 3) -> every title-level bucket non-empty
        if mid == 10:
            cast = [actor(i) for i in (50, 51, 52, 53, 54, 2)]
        if mid == 11:
            cast = [actor(i) for i in (50, 51, 52, 53, 54, 3)]
        if mid == 12:
            cast = [actor(i) for i in (50, 51, 4)]
        if mid == 13:
            cast = [actor(i) for i in (50, 51, 52, 5)]

        toks = list(cast)
        if mid % 7 == 0:  # Unicode + ASCII whitespace padding (F2/F6)
            toks[0] = f"{NBSP} {toks[0]}\t"
        if mid % 19 == 0:  # stray quotes around a token (F3)
            toks[-1] = f'"{toks[-1]}"'
        if mid % 11 == 0:  # comma inside a quoted title (S1)
            title = f"Movie {mid}, The"
        if mid % 13 == 0:  # ""-escaped quotes inside a title (S1)
            title = f'Movie "{mid}"'

        lines.append(f"{mid},{quote(title)},{quote(', '.join(toks))}")
        if mid % 1700 == 0:  # interspersed empty lines (dropped)
            lines.append("")

    # duplicate titles, distinct ids -> last-write-wins keeps the higher id
    nid = N_MOVIES
    lines.append(
        f'{nid + 1},{quote("Movie 5")},{quote(actor(40) + ", " + actor(41))}'
    )
    lines.append(f'{nid + 2},{quote("Movie 8")},{quote(actor(42))}')
    # empty cast field -> kept with an empty actors array
    lines.append(f'{nid + 3},{quote("Castless")},')
    # short row (<3 fields) -> dropped (csv_to_ets.erl:54-56)
    lines.append(f"{nid + 4},Only Two Fields")
    # non-numeric id -> dropped by schema conversion
    lines.append(f'abc,Bad Id,{quote(actor(7))}')

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(f"wrote {OUT} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
