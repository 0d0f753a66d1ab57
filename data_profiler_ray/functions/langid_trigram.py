"""Character-trigram language identification (Cavnar & Trenkle 1994,
"N-Gram-Based Text Categorization" — public method).

Upgrade path for the stopword-hit-rate heuristic (VERDICT r3 item 5): short
texts often contain ZERO exact stopwords but still carry characteristic
character patterns (morphology: German "sch"/"ung", Portuguese "ção",
Polish "rz"/"cz", Swedish "än"). Profiles are rank-ordered trigram lists
built at import from embedded per-language common-word lists (stopwords +
frequent content words — public common-word knowledge, no external corpus,
no model download); classification is the classic out-of-place rank
distance, argmin over languages, 'und' when too few document trigrams match
the winning profile.

The stopword path (functions/text.py:language_id_batch) remains the
SQL-oracled variant — this scorer is rank-based and not SQL-expressible, so
its queries() entry is rows-only and its correctness signal is the
short-sentence accuracy pytest (must beat the stopword path).

Reference gap note: the reference delegates to spaCy +
spacy_language_detection per sentence (/root/reference/stelardataprofiler/
text/profiler.py:283-313); this is the deterministic from-published-spec
analogue.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text import _LANG_STOPWORDS, _set_column

# Frequent content / function words per language beyond the stopword sets —
# chosen to carry each language's characteristic orthography & morphology
# (public common-word knowledge). Profiles are trigram-ranked from
# stopwords ∪ these.
_LANG_COMMON_WORDS = {
    "en": ["have", "not", "you", "they", "will", "would", "there", "what",
           "when", "which", "their", "about", "people", "time", "good",
           "very", "because", "through", "thing", "right", "think", "know",
           "weather", "today", "tomorrow", "morning", "night", "house"],
    "de": ["nicht", "auch", "noch", "schon", "sein", "haben", "werden",
           "können", "müssen", "über", "unter", "zwischen", "wichtig",
           "heute", "morgen", "wetter", "schön", "sprache", "zeit",
           "machen", "sagen", "gehen", "sehen", "immer", "mensch", "jahr",
           "deutschland", "natürlich", "vielleicht", "eigentlich"],
    "fr": ["être", "avoir", "faire", "aussi", "très", "bien", "tout",
           "mais", "plus", "comme", "même", "aujourd'hui", "demain",
           "temps", "beau", "maintenant", "toujours", "quelque", "chose",
           "beaucoup", "français", "année", "jour", "homme", "femme",
           "peut-être", "voilà", "après", "avant", "entre"],
    "es": ["estar", "tener", "hacer", "también", "muy", "bien", "todo",
           "pero", "más", "como", "mismo", "hoy", "mañana", "tiempo",
           "bueno", "ahora", "siempre", "algo", "mucho", "español",
           "año", "día", "hombre", "mujer", "quizás", "después", "antes",
           "entre", "gracias", "hasta"],
    "it": ["essere", "avere", "fare", "anche", "molto", "bene", "tutto",
           "ma", "più", "stesso", "oggi", "domani", "tempo", "buono",
           "adesso", "sempre", "qualcosa", "italiano", "anno", "giorno",
           "uomo", "donna", "forse", "dopo", "prima", "grazie", "perché",
           "quando", "questo", "quella"],
    "pt": ["estar", "ter", "fazer", "também", "muito", "bem", "tudo",
           "mas", "mesmo", "hoje", "amanhã", "tempo", "bom", "agora",
           "sempre", "alguma", "coisa", "português", "ano", "dia",
           "homem", "mulher", "talvez", "depois", "antes", "obrigado",
           "porque", "quando", "coração", "não"],
    "nl": ["hebben", "worden", "kunnen", "moeten", "over", "onder",
           "tussen", "belangrijk", "vandaag", "morgen", "weer", "mooi",
           "taal", "tijd", "maken", "zeggen", "gaan", "zien", "altijd",
           "mens", "jaar", "nederland", "natuurlijk", "misschien",
           "eigenlijk", "goed", "veel", "nog", "wel", "deze"],
    "sv": ["hava", "vara", "kunna", "måste", "över", "under", "mellan",
           "viktig", "idag", "imorgon", "väder", "vacker", "språk", "tid",
           "göra", "säga", "gå", "se", "alltid", "människa", "år",
           "sverige", "naturligtvis", "kanske", "egentligen", "bra",
           "mycket", "ännu", "också", "denna"],
    "pl": ["być", "mieć", "robić", "także", "bardzo", "dobrze",
           "wszystko", "więcej", "dzisiaj", "jutro", "pogoda", "piękny",
           "język", "czas", "zawsze", "człowiek", "rok", "polska",
           "może", "potem", "przed", "między", "dziękuję", "dlaczego",
           "kiedy", "teraz", "jeszcze", "również", "żeby", "który"],
    "da": ["have", "være", "kunne", "skulle", "over", "under", "mellem",
           "vigtig", "idag", "imorgen", "vejr", "smuk", "sprog", "tid",
           "gøre", "sige", "gå", "se", "altid", "menneske", "år",
           "danmark", "naturligvis", "måske", "egentlig", "god", "meget",
           "endnu", "også", "denne"],
    "fi": ["olla", "tehdä", "myös", "hyvin", "kaikki", "enemmän",
           "tänään", "huomenna", "sää", "kaunis", "kieli", "aika",
           "aina", "ihminen", "vuosi", "suomi", "ehkä", "jälkeen",
           "ennen", "välillä", "kiitos", "miksi", "milloin", "nyt",
           "vielä", "paljon", "koska", "sitten", "täällä", "kanssa"],
    "tr": ["olmak", "yapmak", "ayrıca", "iyi", "her", "şey", "bugün",
           "yarın", "hava", "güzel", "dil", "zaman", "her zaman", "insan",
           "yıl", "türkiye", "belki", "sonra", "önce", "arasında",
           "teşekkür", "neden", "şimdi", "henüz", "çünkü", "büyük",
           "küçük", "kadar", "değil", "bütün"],
    "cs": ["být", "mít", "dělat", "také", "velmi", "dobře", "všechno",
           "více", "dnes", "zítra", "počasí", "krásný", "jazyk", "čas",
           "vždy", "člověk", "rok", "česko", "možná", "potom", "před",
           "mezi", "děkuji", "proč", "kdy", "teď", "ještě", "protože",
           "hodně", "který"],
    "ro": ["fi", "avea", "face", "de asemenea", "foarte", "bine", "tot",
           "astăzi", "mâine", "vreme", "frumos", "limbă", "timp",
           "întotdeauna", "om", "an", "românia", "poate", "după",
           "înainte", "între", "mulțumesc", "de ce", "acum", "încă",
           "pentru că", "mult", "mare", "mic", "față"],
    # languages BEYOND the stopword heuristic's set (VERDICT r4 item 3):
    # profiles built from common words alone — the stopword path cannot
    # label these at all
    "hu": ["hogy", "nem", "igen", "van", "volt", "lesz", "nagyon", "jól",
           "minden", "több", "ma", "holnap", "idő", "szép", "nyelv",
           "mindig", "ember", "év", "magyarország", "talán", "után",
           "előtt", "között", "köszönöm", "miért", "mikor", "most",
           "még", "mert", "sok", "és", "az", "egy", "is", "de", "mi",
           "ki", "el", "meg", "csak"],
    "no": ["og", "det", "er", "ikke", "jeg", "han", "hun", "vi", "skal",
           "være", "kunne", "skulle", "over", "under", "mellom",
           "viktig", "vær", "vakkert", "språk", "tid", "gjøre", "si",
           "gå", "se", "alltid", "menneske", "år", "norge", "kanskje",
           "egentlig", "god", "mye", "også", "denne", "noe", "bare",
           "etter", "før", "takk", "hvorfor"],
    "id": ["yang", "dan", "di", "ini", "itu", "dengan", "untuk", "tidak",
           "dari", "dalam", "akan", "pada", "juga", "saya", "kamu",
           "dia", "kami", "mereka", "ada", "bisa", "sudah", "belum",
           "hari", "besok", "cuaca", "bagus", "bahasa", "waktu",
           "selalu", "orang", "tahun", "indonesia", "mungkin", "sesudah",
           "sebelum", "antara", "terima", "kasih", "kenapa", "sekarang"],
}

_PROFILE_SIZE = 300
_DOC_PROFILE_SIZE = 300
_MIN_COVERAGE = 0.2  # fraction of doc trigrams found in winner else 'und'


def _word_trigrams(word: str):
    padded = f" {word} "
    return [padded[i:i + 3] for i in range(len(padded) - 2)]


def build_profiles() -> dict[str, dict[str, int]]:
    """Per-language {trigram: rank} profiles from the embedded word lists.
    Rank by (frequency desc, trigram asc) — deterministic. Covers the
    stopword languages PLUS the common-word-only extensions (hu/no/id)."""
    profiles = {}
    for lang in sorted(set(_LANG_STOPWORDS) | set(_LANG_COMMON_WORDS)):
        counts: dict[str, int] = {}
        words = sorted(set(_LANG_STOPWORDS.get(lang, ()))
                       | set(_LANG_COMMON_WORDS.get(lang, ())))
        for w in words:
            for t in _word_trigrams(w.lower()):
                counts[t] = counts.get(t, 0) + 1
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        profiles[lang] = {t: r for r, (t, _) in
                          enumerate(ranked[:_PROFILE_SIZE])}
    return profiles


class TrigramLangID:
    """map_batches callable (actor-pool stage): profiles built ONCE in
    ``__init__``; per batch, per-document trigram profiles scored by the
    Cavnar–Trenkle out-of-place distance against every language."""

    def __init__(self, text_col: str = "text", per_sentence: bool = False):
        self.text_col = text_col
        self.profiles = build_profiles()
        self.langs = sorted(self.profiles)
        self.max_rank = _PROFILE_SIZE
        # per_sentence: split on sentence boundaries and sum per-language
        # scores across sentences before the argmax — the reference's
        # per-sentence detection feeding per-language score sums
        # (text/profiler.py:283-313)
        self.per_sentence = per_sentence

    def _doc_grams(self, text: str) -> list[str]:
        t = " ".join(text.lower().split())
        if len(t) < 2:
            return []
        padded = f" {t} "
        grams: dict[str, int] = {}
        for i in range(len(padded) - 2):
            g = padded[i:i + 3]
            grams[g] = grams.get(g, 0) + 1
        ranked = sorted(grams.items(), key=lambda kv: (-kv[1], kv[0]))
        return [g for g, _ in ranked[:_DOC_PROFILE_SIZE]]

    def _lang_scores(self, doc: list[str]):
        """(out-of-place distance, profile-hit coverage) per language."""
        dists = np.empty(len(self.langs), dtype=np.int64)
        covs = np.empty(len(self.langs))
        for j, lang in enumerate(self.langs):
            prof = self.profiles[lang]
            dist = 0
            hits = 0
            for r_doc, g in enumerate(doc):
                r_lang = prof.get(g)
                if r_lang is None:
                    dist += self.max_rank
                else:
                    dist += abs(r_doc - r_lang)
                    hits += 1
            dists[j] = dist
            covs[j] = hits / len(doc)
        return dists, covs

    def _classify(self, text: str) -> tuple[str, float]:
        doc = self._doc_grams(text)
        if not doc:
            return "und", 0.0
        dists, covs = self._lang_scores(doc)
        j = int(dists.argmin())
        if covs[j] < _MIN_COVERAGE:
            return "und", float(covs[j])
        return self.langs[j], float(covs[j])

    def classify_document(self, text: str) -> tuple[str, float]:
        """Per-sentence score-sum mode (reference text/profiler.py:283-313):
        each sentence is scored against every language; per-language
        similarities (max_dist − dist, i.e. higher = better) are summed
        weighted by sentence gram count, and the document language is the
        argmax of the sums with the same coverage gate."""
        import re as _re
        if not self.per_sentence:
            return self._classify(text)
        sentences = [s for s in _re.split(r"[.!?]+", text) if s.strip()]
        if len(sentences) <= 1:
            return self._classify(text)
        score_sum = np.zeros(len(self.langs))
        cov_sum = np.zeros(len(self.langs))
        w_tot = 0.0
        for s in sentences:
            doc = self._doc_grams(s)
            if not doc:
                continue
            dists, covs = self._lang_scores(doc)
            w = float(len(doc))
            score_sum += w * (self.max_rank * len(doc) - dists) / (
                self.max_rank * len(doc))
            cov_sum += w * covs
            w_tot += w
        if w_tot == 0.0:
            return "und", 0.0
        j = int(score_sum.argmax())
        cov = float(cov_sum[j] / w_tot)
        if cov < _MIN_COVERAGE:
            return "und", cov
        return self.langs[j], cov

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        preds = np.empty(len(texts), dtype=object)
        covs = np.zeros(len(texts))
        for i, s in enumerate(texts):
            preds[i], covs[i] = self.classify_document(s or "")
        out = _set_column(batch, "lang_pred", pa.array(preds, pa.string()))
        return _set_column(out, "lang_coverage",
                           pa.array(covs, pa.float64()))
