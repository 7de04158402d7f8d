"""JSON round-trip fidelity (S1/S2): load -> export is exact for canonical
files and a fixed point for files needing migration."""

from __future__ import annotations

import json

import pytest

from docling_core_spark.model.doc import Doc

from .conftest import load_doc_json


@pytest.mark.parametrize("name", ["activities.json", "polymers.json", "checkboxes.json"])
def test_roundtrip_exact(name):
    orig = load_doc_json(f"doc/{name}")
    rt = Doc.from_dict(json.loads(json.dumps(orig))).to_dict()
    assert rt == orig


@pytest.mark.parametrize(
    "name",
    [
        "barchart.json",  # legacy annotations migrate into meta on load
        "2311.18481v1.json",  # older schema lacking pydantic defaults
        "2206.01062.yaml.dt.json",
    ],
)
def test_roundtrip_fixed_point(name):
    """Migration applies once; a second round-trip changes nothing."""
    orig = load_doc_json(f"doc/{name}")
    once = Doc.from_dict(json.loads(json.dumps(orig))).to_dict()
    twice = Doc.from_dict(json.loads(json.dumps(once))).to_dict()
    assert once == twice
