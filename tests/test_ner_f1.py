"""Entity-level F1 on the labeled NER fixture (VERDICT r4 item 8).

The r4 gazetteer+shape rules measured **F1 = 0.68** on this fixture
(micro, (text, label) exact match). The r5 chunker upgrade — acronym
tokens, lowercase-connector runs ("University of Oxford", "van der"),
leading article/honorific stripping, PERSON-of-ORG splitting, NORP
demonyms, Month-Year dates, comma-grouped cardinals — must stay well
above that. Reference fidelity target: spaCy ``doc.ents`` label space at
/root/reference/stelardataprofiler/text/profiler.py:449-465.
"""

import pyarrow as pa

from ner_fixture import GOLD, entity_f1

from data_profiler_ray.functions.text_nlp import NerTagger, ner_batch

R4_BASELINE_F1 = 0.68   # measured on this fixture before the r5 upgrade


def test_entity_f1_improved_over_r4_rules():
    tagger = NerTagger()
    pred = [{(e["text"], e["label"]) for e in tagger._doc_entities(s)}
            for s, _ in GOLD]
    res = entity_f1(pred, [g for _, g in GOLD])
    # report the score in the assertion message so the run logs carry it
    assert res["f1"] >= 0.95, f"entity F1 regressed: {res}"
    assert res["f1"] > R4_BASELINE_F1 + 0.1, f"no improvement vs r4: {res}"
    assert res["precision"] >= 0.95 and res["recall"] >= 0.95, res


def test_entity_f1_via_batch_api():
    """Same score through the public map_batches surface."""
    tbl = pa.table({"text": pa.array([s for s, _ in GOLD])})
    out = ner_batch(tbl)["entities"].to_pylist()
    pred = [{(e["text"], e["label"]) for e in ents} for ents in out]
    res = entity_f1(pred, [g for _, g in GOLD])
    assert res["f1"] >= 0.95, res


def test_chunker_shapes():
    """Spot-check the specific shapes the r5 chunker added."""
    tagger = NerTagger()

    def ents(s):
        return {(e["text"], e["label"]) for e in tagger._doc_entities(s)}

    assert ("University of Oxford", "ORG") in ents(
        "She studied at the University of Oxford.")
    assert ("NASA", "ORG") in ents("Funding for NASA rose.")
    assert ("John F. Kennedy", "PERSON") in ents(
        "A speech by John F. Kennedy aired.")
    assert ("David van der Berg", "PERSON") in ents(
        "We met David van der Berg there.")
    got = ents("Anna Schmidt of Deutsche Bank resigned.")
    assert ("Anna Schmidt", "PERSON") in got
    assert ("Deutsche Bank", "ORG") in got
    assert ("French", "NORP") in ents("The French ambassador spoke.")
    assert ("Diaz", "PERSON") in ents("We asked Professor Diaz about it.")
    assert ("March 2021", "DATE") in ents("Sales peaked in March 2021.")
    assert ("4,500", "CARDINAL") in ents("They sold 4,500 units.")
