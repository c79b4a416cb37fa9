"""Byte-identical golden tests: every readability fixture of the reference
(`/root/reference/src/full_text_parser/readability/tests.rs:9-58`) must
serialize exactly."""

import os

import pytest

from article_extractor_spark.core import pipeline
from tests.conftest import FIXTURE_DIR, read_fixture

NAMES = sorted(
    d for d in os.listdir(os.path.join(FIXTURE_DIR, "readability"))
    if os.path.isdir(os.path.join(FIXTURE_DIR, "readability", d))
)


@pytest.mark.parametrize("name", NAMES)
def test_readability_golden(name):
    src = read_fixture("readability", name, "source.html")
    expected = read_fixture("readability", name, "expected.html")
    out = pipeline.run_golden_pipeline(src)
    assert out == expected, f"{name}: output differs from golden"
