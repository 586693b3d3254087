"""Generate the committed movies-CSV fixture (FIXTURES.md §1).

Deterministic (seeded) dirty-CSV corpus exercising every ingest trait the
reference defines (SURVEY.md §1.2, /root/reference/Code/dataAnalyze.erl:42-104,
csv_to_ets.erl:19-60): quoted comma titles, ""-escaped quotes, Unicode and
ASCII whitespace around actor tokens, stray quotes around tokens, empty
lines, short (<3 field) rows, non-numeric ids, duplicate titles, an empty
cast field, and a hub actor + a 5-shared-actor movie pair so every level
bucket 1..4 of the two core queries is populated.

Run from the repo root: ``python tools/gen_movies_fixture.py``. The output
is committed; regeneration is bit-identical.
"""

from __future__ import annotations

import random
from pathlib import Path

OUT = Path(__file__).resolve().parents[1] / "fixtures" / "movies_dirty.csv"

N_MOVIES = 240
N_ACTORS = 60
HUB = "Actor_0001"
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
        # hub actor joins ~1 in 3 casts (exercises the >=4 level cap)
        if mid % 3 == 0 and HUB not in cast:
            cast[0] = HUB
        # movies 10 and 11 share exactly 5 actors -> a level-4 title pair
        if mid == 10:
            cast = [actor(i) for i in (50, 51, 52, 53, 54, 2)]
        if mid == 11:
            cast = [actor(i) for i in (50, 51, 52, 53, 54, 3)]

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
        if mid % 17 == 0:  # interspersed empty lines (dropped)
            lines.append("")

    # duplicate titles, distinct ids -> last-write-wins keeps the higher id
    lines.append(f'301,{quote("Movie 5")},{quote(actor(40) + ", " + actor(41))}')
    lines.append(f'302,{quote("Movie 8")},{quote(actor(42))}')
    # empty cast field -> kept with an empty actors array
    lines.append(f'303,{quote("Castless")},')
    # short row (<3 fields) -> dropped (csv_to_ets.erl:54-56)
    lines.append("304,Only Two Fields")
    # non-numeric id -> dropped by schema conversion
    lines.append(f'abc,Bad Id,{quote(actor(7))}')

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(f"wrote {OUT} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
