"""Mojibake detection & repair — encoding-damage hygiene for web text.

Common Crawl pages frequently carry *mojibake*: UTF-8 byte sequences
that were decoded as Latin-1/Windows-1252 somewhere upstream, turning
``é`` into ``Ã©`` and a right single quote into ``â€™``. The public
treatment is ftfy (Speer, "ftfy: fixing Unicode for fun and profit");
full ftfy re-decodes byte-level round-trips, but the overwhelming mass
of real damage is a small closed set of 2-3 character signatures, which
is exactly a deterministic replace chain — whole-stage-codegen string
algebra that DuckDB evaluates identically (the ``mojibake_report``
oracle value-checks the repair byte-for-byte).

The damage table is COMPUTED, not transcribed: for each clean glyph we
re-enact the historical bug (``glyph.encode('utf-8')`` read back as
Windows-1252, with the five cp1252 holes passing through like browsers
pass them). Signatures are applied and counted longest-first so the
2-char prefix ``â€`` (the stripped-control form of the right double
quote) never fires inside its longer 3-char siblings.

Spark shape: zero shuffle, zero Python at run time — a chained
``replace`` plus a ``regexp_count`` detector built as a plain literal
alternation (no classes, no lookaround → identical automaton in Java
and RE2). Pages whose post-repair text still differs from a clean
round-trip carry damage outside the table and are quality-gate drop
candidates rather than silent training rows.

Reference parity: the reference never inspects content encodings (it
hashes raw bytes); this operator belongs to the north_star's
training-data extension tier, next to quality scoring (functions/text)
and C4 hygiene (operators/c4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# bytes Windows-1252 leaves unmapped; browsers (and hence real-world
# mojibake) pass the raw control char through — model the same
_CP1252_HOLES = frozenset((0x81, 0x8D, 0x8F, 0x90, 0x9D))


def _damage(s: str) -> str:
    """Re-enact the bug: UTF-8 bytes of ``s`` read as Windows-1252."""
    return "".join(
        chr(b) if b in _CP1252_HOLES else bytes([b]).decode("cp1252")
        for b in s.encode("utf-8")
    )


# clean glyphs whose damaged forms are engine-portable literals (no
# control chars): general punctuation + the common Latin-1 accents +
# nbsp. The right double quote is special-cased below — its true
# damaged form contains cp1252-hole byte 0x9D, which web pipelines
# usually strip, leaving the bare 2-char prefix.
_CLEAN_GLYPHS = "“’‘–—…" "éèäöüñçóíúá«»° "

MOJIBAKE_TABLE: tuple[tuple[str, str], ...] = tuple(
    sorted(
        ((_damage(g), g) for g in _CLEAN_GLYPHS),
        key=lambda kv: -len(kv[0]),
    )
) + ((_damage("”")[:2], "”"),)  # bare "â€" → ” (stripped 0x9D)

# longest-first literal alternation (none of the signature characters
# is a regex metacharacter, so no escaping)
MOJIBAKE_MARKER_RE = "|".join(s for s, _ in MOJIBAKE_TABLE)


def mojibake_count(text: Column) -> Column:
    """Occurrences of known mojibake signatures — 0 for clean text, and
    0 after :func:`fix_mojibake` by construction (no repaired glyph
    contains a signature)."""
    return F.regexp_count(text, F.lit(MOJIBAKE_MARKER_RE))


def fix_mojibake(text: Column) -> Column:
    """Repair the signature table (longest-first replace chain). Text
    with no signature passes through byte-identical."""
    out = text
    for broken, fixed in MOJIBAKE_TABLE:
        out = F.replace(out, F.lit(broken), F.lit(fixed))
    return out
