"""OCR model resolution (SURVEY §2.3 O2): scan a tessdata-style
directory, validate the requested language, default to the "+"-joined
set of everything available — the reference's TesseractData semantics
(/root/reference/src/PgsToSrt/TesseractData.cs:18-66):

- available languages = ``*.traineddata`` file stems, lowercased
  (:47-60); we sort them (GetFiles order is filesystem-dependent — a
  deterministic generalization, documented deviation);
- a wanted language that is not in the set is an error listing the
  available ones (:23-31);
- a valid wanted language is returned AS GIVEN, not lowercased (:32-35
  — only the membership check lowercases);
- no wanted language => join all available with "+" (:36-39, :63-66);
- an empty directory is an error (:40-43).

The engine stage (stages/extract.py) resolves once per actor in
``__init__`` — model selection is warm state, never per batch.
"""

from __future__ import annotations

from pathlib import Path


def available_languages(data_dir: str) -> list[str]:
    """Sorted lowercased stems of ``*.traineddata`` files."""
    return sorted(p.stem.lower()
                  for p in Path(data_dir).glob("*.traineddata"))


def default_language(languages: list[str]) -> str:
    """The reference's GetDefaultTesseractLanguage (:63-66)."""
    return "+".join(languages)


def resolve_language(data_dir: str, wanted: str | None = None) -> str:
    """GetTesseractLanguage (:18-45) with errors raised instead of
    logged-and-None."""
    languages = available_languages(data_dir)
    if wanted is not None:
        if wanted.lower() not in languages:
            raise ValueError(
                f"Language '{wanted}' is not available in Tesseract data "
                f"directory. Available languages: {languages}")
        return wanted
    if languages:
        return default_language(languages)
    raise ValueError("No tesseract language data files found.")


# the engine majors this pipeline's glyph decoder is validated against
# (the reference accepts tesseract major 4 or 5 and forces 5 on
# Windows, Runner.cs:55-76; our fixture-defined engine versions its
# glyph table the same way)
SUPPORTED_ENGINE_MAJORS = (4, 5)
ENGINE_VERSION = "5.0.0-glyph"


def validate_engine_version(version: str | None = None) -> str:
    """Engine-version preflight (Runner.cs:55-76 analogue): accept a
    supported major, reject anything else BEFORE the pool spins up —
    a misconfigured engine must fail the run at construction, not
    produce wrong text across 10^12 rows."""
    v = version or ENGINE_VERSION
    try:
        major = int(v.split(".", 1)[0])
    except ValueError:
        raise ValueError(f"Unparseable engine version: {v!r}")
    if major not in SUPPORTED_ENGINE_MAJORS:
        raise ValueError(
            f"Unsupported engine major {major} (version {v!r}); "
            f"supported: {SUPPORTED_ENGINE_MAJORS}")
    return v
