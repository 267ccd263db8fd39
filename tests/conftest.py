from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def stub_reference_deps() -> None:
    """Install fake third-party modules the read-only reference imports
    (requests/tqdm/lxml/SPARQLWrapper are absent here and unused by the
    code paths our differential tests exercise). Idempotent and attribute-
    complete so test ordering doesn't matter."""
    import types

    for name in ("requests", "tqdm"):
        mod = sys.modules.setdefault(name, types.ModuleType(name))
        if not hasattr(mod, "tqdm"):
            mod.tqdm = lambda x, **k: x
        if not hasattr(mod, "get"):
            mod.get = None
    if "lxml" not in sys.modules:
        lxml = types.ModuleType("lxml")
        lxml.etree = types.ModuleType("lxml.etree")
        sys.modules["lxml"] = lxml
        sys.modules["lxml.etree"] = lxml.etree
    if "SPARQLWrapper" not in sys.modules:
        mod = types.ModuleType("SPARQLWrapper")
        mod.SPARQLWrapper = object
        mod.JSON, mod.XML = "json", "xml"
        exc = types.ModuleType("SPARQLWrapper.SPARQLExceptions")
        exc.EndPointInternalError = type(
            "EndPointInternalError", (Exception,), {})
        mod.SPARQLExceptions = exc
        sys.modules["SPARQLWrapper"] = mod
        sys.modules["SPARQLWrapper.SPARQLExceptions"] = exc


@pytest.fixture(scope="session")
def spark():
    from wde_spark.core.session import get_session

    s = get_session("wde_tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
