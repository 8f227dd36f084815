"""O2 model resolution tests (TesseractData.cs:18-66 semantics)."""

import pytest

from pgstosrt_ray.models import (available_languages, default_language,
                                 resolve_language)
from pgstosrt_ray.stages.extract import ExtractorEngine


@pytest.fixture
def tessdata(tmp_path):
    for name in ["ENG.traineddata", "fra.traineddata", "deu.traineddata"]:
        (tmp_path / name).write_bytes(b"fake model")
    (tmp_path / "notes.txt").write_bytes(b"ignored")
    return str(tmp_path)


def test_available_languages_lowercased_sorted(tessdata):
    assert available_languages(tessdata) == ["deu", "eng", "fra"]


def test_default_is_plus_join(tessdata):
    assert resolve_language(tessdata) == "deu+eng+fra"
    assert default_language(["a", "b"]) == "a+b"


def test_wanted_language_kept_verbatim(tessdata):
    # membership check lowercases, the returned value does not (:32-35)
    assert resolve_language(tessdata, "FRA") == "FRA"
    assert resolve_language(tessdata, "fra") == "fra"


def test_unknown_language_rejected_listing_available(tessdata):
    with pytest.raises(ValueError, match="spa.*deu.*eng.*fra"):
        resolve_language(tessdata, "spa")


def test_empty_dir_rejected(tmp_path):
    with pytest.raises(ValueError, match="No tesseract language data"):
        resolve_language(str(tmp_path))


def test_engine_resolves_in_constructor(tessdata):
    eng = ExtractorEngine(language=None, tessdata_dir=tessdata)
    assert eng.language == "deu+eng+fra"
    eng = ExtractorEngine(language="eng", tessdata_dir=tessdata)
    assert eng.language == "eng"
    with pytest.raises(ValueError):
        ExtractorEngine(language="xxx", tessdata_dir=tessdata)


def test_engine_default_without_dir():
    assert ExtractorEngine().language == "eng"


class TestEngineVersion:
    def test_default_version_accepted(self):
        from pgstosrt_ray.models import ENGINE_VERSION, validate_engine_version
        assert validate_engine_version() == ENGINE_VERSION

    def test_supported_majors(self):
        from pgstosrt_ray.models import validate_engine_version
        assert validate_engine_version("4.1.1") == "4.1.1"
        assert validate_engine_version("5.3.0") == "5.3.0"

    def test_unsupported_major_rejected(self):
        import pytest
        from pgstosrt_ray.models import validate_engine_version
        with pytest.raises(ValueError, match="Unsupported engine major"):
            validate_engine_version("3.0.5")

    def test_garbage_version_rejected(self):
        import pytest
        from pgstosrt_ray.models import validate_engine_version
        with pytest.raises(ValueError, match="Unparseable"):
            validate_engine_version("not-a-version")
