"""Char-trigram language ID (Cavnar-Trenkle) — short-text accuracy must
beat the stopword-hit heuristic (VERDICT r3 item 5 done-condition)."""

import numpy as np
import pyarrow as pa

from data_profiler_ray.functions.langid_trigram import TrigramLangID
from data_profiler_ray.functions.text import language_id_batch

# short (<8 token) sentences, mostly content words — the regime where
# exact stopword hits are rare but character morphology is distinctive
_SHORT = {
    "en": ["weather looks good today", "people think things through",
           "having breakfast right now", "birds sing every morning",
           "thinking about tomorrow night"],
    "de": ["schönes wetter heute morgen", "natürlich sprechen wir deutsch",
           "wichtige sachen zuerst machen", "vielleicht kommen sie später",
           "menschen gehen immer weiter"],
    "fr": ["aujourd'hui il fait beau", "peut-être demain matin",
           "toujours quelque chose à faire", "beaucoup de choses importantes",
           "après la pluie le beau temps"],
    "es": ["mañana será otro día", "gracias por todo amigo",
           "siempre hace buen tiempo", "quizás llueva esta tarde",
           "hablamos español todos juntos"],
    "it": ["oggi fa molto caldo", "grazie mille per tutto",
           "forse domani piove ancora", "parliamo italiano ogni giorno",
           "sempre qualcosa da fare"],
    "pt": ["amanhã será outro dia", "obrigado por tudo amigo",
           "hoje faz muito calor", "talvez chova esta tarde",
           "falamos português todos juntos"],
    "nl": ["vandaag is het mooi weer", "morgen wordt het beter",
           "natuurlijk spreken wij nederlands", "belangrijke dingen eerst doen",
           "misschien komen ze later"],
    "pl": ["dzisiaj jest piękna pogoda", "jutro będzie lepiej",
           "mówimy po polsku codziennie", "dziękuję za wszystko przyjacielu",
           "może przyjdą później"],
}


def _accuracy(pred, truth):
    return float(np.mean([p == t for p, t in zip(pred, truth)]))


def test_trigram_beats_stopword_on_short_sentences():
    texts, truth = [], []
    for lang, sents in _SHORT.items():
        for s in sents:
            assert len(s.split()) < 8
            texts.append(s)
            truth.append(lang)
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    trig = TrigramLangID()(tbl).column("lang_pred").to_pylist()
    stop = language_id_batch(tbl).column("lang_pred").to_pylist()
    acc_t, acc_s = _accuracy(trig, truth), _accuracy(stop, truth)
    assert acc_t > acc_s, (acc_t, acc_s)
    assert acc_t >= 0.75, (acc_t, list(zip(texts, truth, trig)))


def test_trigram_handles_empty_and_und():
    tbl = pa.table({"text": pa.array(["", "   ", "12345 67890 0000"],
                                     pa.string())})
    out = TrigramLangID()(tbl).column("lang_pred").to_pylist()
    assert out[0] == "und" and out[1] == "und"
