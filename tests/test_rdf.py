"""RDF parse + graph-metric tests (lifts SURVEY S6/J2/A20/D3).

The fixture graph is small enough that every reference metric
(rdfGraph/profiler.py:63-247) is hand-computable: 9 triples, 9 nodes
(literals are nodes, per rdflib all_nodes()), 2 components, density
9/(9·8), class distribution Person:2 City:1.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from data_profiler_ray.functions.rdf import (RDF_TYPE, namespace_of,
                                             parse_ntriples, parse_turtle)
from data_profiler_ray.pipelines.rdf import profile_rdf_dataset

EX = "http://ex.org/"

TTL = """\
@prefix ex: <http://ex.org/> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
# two people, one city, one disconnected pair
ex:a a ex:Person ;
     ex:knows ex:b ;
     ex:livesIn ex:c ;
     ex:name "Alice" .
ex:b a ex:Person ; ex:livesIn ex:c ; ex:name "Bob" .
ex:c a ex:City .
ex:d ex:knows ex:e .
"""

NT = "\n".join([
    f'<{EX}a> <{RDF_TYPE}> <{EX}Person> .',
    f'<{EX}a> <{EX}knows> <{EX}b> .',
    f'<{EX}a> <{EX}livesIn> <{EX}c> .',
    f'<{EX}a> <{EX}name> "Alice" .',
    f'<{EX}b> <{RDF_TYPE}> <{EX}Person> .',
    f'<{EX}b> <{EX}livesIn> <{EX}c> .',
    f'<{EX}b> <{EX}name> "Bob" .',
    f'<{EX}c> <{RDF_TYPE}> <{EX}City> .',
    f'<{EX}d> <{EX}knows> <{EX}e> .',
])


def test_ntriples_parse():
    tbl = parse_ntriples(NT)
    assert tbl.num_rows == 9
    assert tbl.column("object_is_iri").to_pylist().count(False) == 2
    assert set(tbl.column("predicate").to_pylist()) == {
        RDF_TYPE, f"{EX}knows", f"{EX}livesIn", f"{EX}name"}


def test_ntriples_literal_escapes_and_types():
    tbl = parse_ntriples(
        '<http://x/s> <http://x/p> "line\\nbreak \\"q\\"" .\n'
        '<http://x/s> <http://x/p> "42"^^<http://www.w3.org/2001/XMLSchema#int> .\n'
        '<http://x/s> <http://x/p> "hi"@en .\n'
        '_:b1 <http://x/p> _:b2 .')
    objs = tbl.column("object").to_pylist()
    assert objs[0] == 'line\nbreak "q"'
    assert objs[1] == "42" and objs[2] == "hi"
    assert tbl.column("subject").to_pylist()[3] == "_:b1"


def test_ntriples_malformed():
    for bad in ["<a> <b> .", "<a> <b> <c>", "nonsense",
                '<a> "lit" <c> .']:
        with pytest.raises(ValueError):
            parse_ntriples(bad)


def test_turtle_equals_ntriples():
    t1 = parse_turtle(TTL)
    t2 = parse_ntriples(NT)
    key = lambda t: sorted(zip(t.column("subject").to_pylist(),
                               t.column("predicate").to_pylist(),
                               t.column("object").to_pylist(),
                               t.column("object_is_iri").to_pylist()))
    assert key(t1) == key(t2)


def test_turtle_unsupported_constructs():
    with pytest.raises(ValueError):
        parse_turtle("@prefix ex: <http://e/> . ex:a ex:p [ ex:q 1 ] .")
    with pytest.raises(ValueError):
        parse_turtle("ex:a ex:p ex:b .")   # undeclared prefix


def test_namespace_of():
    assert namespace_of(f"{EX}knows") == EX
    assert namespace_of(RDF_TYPE) == \
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def test_profile_rdf_dataset_hand_oracle(ray_session):
    ds = ray.data.from_arrow(parse_turtle(TTL))
    prof = profile_rdf_dataset(ds)
    t = prof["table"]
    assert t["num_edges"] == 9
    assert t["num_nodes"] == 9            # 5 iris + 2 classes + 2 literals
    assert t["num_namespaces"] == 2       # ex.org + rdf-syntax-ns
    assert t["num_classes"] == 2
    assert t["num_object_properties"] == 7   # distinct IRI nodes
    assert t["num_datatype_properties"] == 2  # "Alice","Bob"
    assert t["num_connected_components"] == 2
    assert t["density"] == pytest.approx(9 / (9 * 8))
    v = prof["variables"][0]
    assert v["class_distribution"] == [
        {"class_name": f"{EX}Person", "count": 2},
        {"class_name": f"{EX}City", "count": 1}]
    assert sorted(c["num_nodes"] for c in v["connected_components"]) == \
        [2, 7]
    # degree distributions vs pandas describe over the hand-derived
    # MultiDiGraph degrees [4,4,3,2,1,1,1,1,1]
    degs = pd.Series([4, 4, 3, 2, 1, 1, 1, 1, 1], dtype=float)
    got = v["degree_distribution"]
    assert got["count"] == 9
    assert got["average"] == pytest.approx(degs.mean())
    assert got["stddev"] == pytest.approx(degs.std())
    assert got["kurtosis"] == pytest.approx(degs.kurtosis())
    assert got["min"] == 1 and got["max"] == 4
    # in/out include explicit zeros (networkx semantics)
    assert v["in_degree_distribution"]["count"] == 9
    assert v["in_degree_distribution"]["min"] == 0
    assert v["out_degree_distribution"]["min"] == 0
    assert v["out_degree_distribution"]["max"] == 4
    cent = v["degree_centrality_distribution"]
    assert cent["max"] == pytest.approx(4 / 8)


def test_profile_rdf_guard(ray_session):
    ds = ray.data.from_arrow(parse_turtle(TTL))
    with pytest.raises(ValueError):
        profile_rdf_dataset(ds, max_edges=3)
