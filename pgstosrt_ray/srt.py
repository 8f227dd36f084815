"""SRT timestamp formatting + SubRip serialization (SURVEY.md §2 F3, S8).

The reference delegates these to the external libse package (SubRip /
TimeCode, invoked at /root/reference/src/PgsToSrt/PgsOcr.cs:59-63,88-94),
so per SURVEY §7 ("hard parts") the exact semantics are PINNED here and
the oracle and the Ray pipeline both use this module:

  - cue times enter as 90 kHz ticks and convert to ms as ticks/90.0
    (PgsOcr.cs:91-92) — float64 division at serialization only;
  - total milliseconds round half-up to an integer (the .NET
    TimeSpan.FromMilliseconds behavior TimeCode builds on), then
    decompose to HH:MM:SS,mmm;
  - one cue block is "{n}\\n{start} --> {end}\\n{text}\\n\\n" with 1-based
    numbering; the document is the concatenation (trailing blank line
    kept), encoded UTF-8 without BOM (PgsOcr.cs:61).
"""

from __future__ import annotations

import math

TICKS_PER_MS = 90.0


def ticks_to_ms(ticks: int) -> float:
    return ticks / TICKS_PER_MS


def format_timestamp(ms: float) -> str:
    """HH:MM:SS,mmm with total ms rounded half-up (non-negative input)."""
    total = int(math.floor(ms + 0.5))
    h, rem = divmod(total, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, msec = divmod(rem, 1_000)
    return f"{h:02d}:{m:02d}:{s:02d},{msec:03d}"


def serialize_srt(cues: list[tuple[float, float, str]]) -> str:
    """``cues`` = ordered (start_ms, end_ms, text); returns the SubRip
    document string (UTF-8-no-BOM is the writer's concern)."""
    parts = []
    for i, (start_ms, end_ms, text) in enumerate(cues):
        parts.append(f"{i + 1}\n{format_timestamp(start_ms)} --> "
                     f"{format_timestamp(end_ms)}\n{text}\n\n")
    return "".join(parts)
