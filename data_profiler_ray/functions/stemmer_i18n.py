"""Multi-language stemming (VERDICT r2 missing item 3).

The reference stems per detected language via NLTK's SnowballStemmer
(``/root/reference/stelardataprofiler/text/profiler.py:337-341``) and
lemmatizes with simplemma (``:343-365``). Neither library exists in this
environment, so:

- **German** gets a from-the-spec implementation of the published
  Snowball German stemmer (Porter's Snowball site, public algorithm
  description: R1/R2 regions, 3 suffix steps, umlaut/ß normalization).
  The post-2021 ``niss`` refinement is not included (documented delta).
- **French / Spanish / Italian / Portuguese** get light stemmers in the
  published inflectional-suffix-removal style (Savoy 2006, "Light
  stemming approaches..."): strip plural/gender/diminutive endings with
  minimum-stem-length guards. Light stemmers deliberately under-stem
  relative to Snowball (they target inflection, not derivation).
- **English** dispatches to the existing Porter implementation
  (``functions/stemmer.py``).

``stem_token(token, lang)`` is the single dispatch point used by the M7
cleaning chain. Unknown languages return the token unchanged.
"""

from __future__ import annotations

from functools import lru_cache

# ---------------------------------------------------------------------------
# German Snowball

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"   # valid s-endings (step 1c)
_DE_ST_END = "bdfghklmnt"   # valid st-endings (step 2b)


def _de_prelude(w: str) -> str:
    w = w.replace("ß", "ss")
    # mark u/y between vowels as consonants (upper case placeholder)
    out = list(w)
    for i in range(1, len(w) - 1):
        if w[i] in "uy" and w[i - 1] in _DE_VOWELS and w[i + 1] in _DE_VOWELS:
            out[i] = w[i].upper()
    return "".join(out)


def _de_r1_r2(w: str) -> tuple[int, int]:
    """Start offsets of R1 and R2 (len(w) when absent). R1 is adjusted so
    that at least 3 characters precede it (spec's German particularity)."""
    def _after_first_nonvowel_after_vowel(s: str, start: int) -> int:
        # NB: the U/Y placeholders from _de_prelude are uppercase on
        # purpose — they must test as consonants here
        i = start
        while i < len(s) and s[i] not in _DE_VOWELS:
            i += 1
        while i < len(s) and s[i] in _DE_VOWELS:
            i += 1
        return min(i + 1, len(s)) if i < len(s) else len(s)

    r1 = _after_first_nonvowel_after_vowel(w, 0)
    r2 = _after_first_nonvowel_after_vowel(w, r1)
    return max(r1, 3), r2


def _de_stem(word: str) -> str:
    w = _de_prelude(word.lower())
    if len(w) < 3:
        return word.lower().replace("ß", "ss")
    r1, r2 = _de_r1_r2(w)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1: longest of (a) em ern er | (b) e en es | (c) s after valid
    # s-ending; delete if the suffix is in R1
    for suf in ("ern", "em", "er"):
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if w.endswith(suf):
                if in_r1(len(w) - len(suf)):
                    w = w[: -len(suf)]
                break
        else:
            if (w.endswith("s") and len(w) >= 2 and w[-2] in _DE_S_END
                    and in_r1(len(w) - 1)):
                w = w[:-1]

    # step 2: longest of (a) en er est | (b) st after valid st-ending
    # preceded by ≥3 letters; delete if in R1
    for suf in ("est", "en", "er"):
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
            break
    else:
        if (w.endswith("st") and len(w) >= 6 and w[-3] in _DE_ST_END
                and in_r1(len(w) - 2)):
            w = w[:-2]

    # step 3: d-suffixes
    if w.endswith(("end", "ung")):
        if in_r2(len(w) - 3):
            w = w[:-3]
            if (w.endswith("ig") and in_r2(len(w) - 2)
                    and (len(w) < 3 or w[-3] != "e")):
                w = w[:-2]
    elif w.endswith(("isch", "ik", "ig")):
        suf = "isch" if w.endswith("isch") else w[-2:]
        pos = len(w) - len(suf)
        if in_r2(pos) and (pos == 0 or w[pos - 1] != "e"):
            w = w[:pos]
    elif w.endswith(("lich", "heit")):
        if in_r2(len(w) - 4):
            w = w[:-4]
            if w.endswith(("er", "en")) and in_r1(len(w) - 2):
                w = w[:-2]
    elif w.endswith("keit"):
        if in_r2(len(w) - 4):
            w = w[:-4]
            if w.endswith("lich") and in_r2(len(w) - 4):
                w = w[:-4]
            elif w.endswith("ig") and in_r2(len(w) - 2):
                w = w[:-2]

    # postlude: unmark U/Y, fold umlauts
    return (w.replace("U", "u").replace("Y", "y")
            .replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# ---------------------------------------------------------------------------
# Light stemmers (inflection removal with minimum-stem guards)

def _fr_stem(word: str) -> str:
    """French light stemmer: plural/feminine inflection removal."""
    w = word.lower()
    if len(w) <= 4:
        return w
    if w.endswith("aux") and len(w) > 5:          # chevaux → cheval
        return w[:-3] + "al"
    for suf in ("issements", "issement", "atrices", "atrice", "ements",
                "ement", "euses", "euse"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    if w.endswith(("x",)) and len(w) > 5:          # -eux/-oux plural x
        w = w[:-1]
    if w.endswith("s") and len(w) > 5:
        w = w[:-1]
    if w.endswith("nte") and len(w) > 5:           # -ante/-ente fem.
        w = w[:-1]
    if w.endswith("ée") and len(w) > 5:
        w = w[:-1]
    if w.endswith("e") and len(w) > 5:
        w = w[:-1]
    if len(w) > 4 and w[-1] == w[-2] and w[-1] not in "aeiou":
        w = w[:-1]                                  # undouble (belle→bel)
    return w


def _es_stem(word: str) -> str:
    """Spanish light stemmer: plural + gender inflection removal."""
    w = word.lower()
    if len(w) <= 4:
        return w
    if w.endswith("eces") and len(w) > 5:          # veces → vez
        return w[:-4] + "ez"
    if w.endswith("ces") and len(w) > 5:           # luces → luz
        return w[:-3] + "z"
    for suf in ("ciones", "ción", "cion"):         # canciones → can...
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)] + "cion"
    if w.endswith("es") and len(w) > 5 and w[-3] not in "aeiou":
        return w[:-2]                               # papeles → papel
    if w.endswith("s") and len(w) > 4 and w[-2] in "aeiou":
        w = w[:-1]                                  # libros → libro
    for suf in ("a", "o", "e"):                     # gender vowel
        if w.endswith(suf) and len(w) > 4:
            return w[:-1]
    return w


def _it_stem(word: str) -> str:
    """Italian light stemmer: final-vowel inflection removal."""
    w = word.lower()
    if len(w) <= 4:
        return w
    if w.endswith(("zione", "zioni")) and len(w) > 7:
        return w[:-5] + "zion"
    if w.endswith(("che", "chi", "ghe", "ghi")) and len(w) > 5:
        return w[:-2]                               # amiche → amic+h? → amic
    if w[-1] in "aeio" and len(w) > 4:
        w = w[:-1]                                  # libri → libr
        if w[-1] in "ei" and len(w) > 4:
            w = w[:-1]
    return w


def _pt_stem(word: str) -> str:
    """Portuguese light stemmer: plural + gender inflection removal."""
    w = word.lower()
    if len(w) <= 4:
        return w
    if w.endswith("ões") or w.endswith("oes"):     # ações → ação
        return w[:-3] + "ão"
    if w.endswith("ais") and len(w) > 5:           # animais → animal
        return w[:-2] + "l"
    if w.endswith("res") and len(w) > 5:           # flores → flor
        return w[:-2]
    if w.endswith("s") and len(w) > 4 and w[-2] in "aeiou":
        w = w[:-1]
    for suf in ("a", "o", "e"):
        if w.endswith(suf) and len(w) > 4:
            return w[:-1]
    return w


_DISPATCH = {"de": _de_stem, "fr": _fr_stem, "es": _es_stem,
             "it": _it_stem, "pt": _pt_stem}


@lru_cache(maxsize=262_144)
def stem_token(token: str, lang: str = "en") -> str:
    """Stem ``token`` for ``lang``: Porter for English, Snowball German,
    light stemmers for fr/es/it/pt, identity otherwise. Memoized — callers
    should still deduplicate tokens per batch first (cost is then
    O(distinct tokens))."""
    if lang == "en":
        from .stemmer import stem_memo
        return stem_memo(token)
    fn = _DISPATCH.get(lang)
    return fn(token) if fn else token
