"""English lemmatizer: irregular-form dictionary + regular inflection rules.

The reference lemmatizes with simplemma's lookup tables
(``/root/reference/stelardataprofiler/text/profiler.py:343-365``); this is
the dependency-free analogue: a curated irregular-form map (common verbs,
nouns, comparatives) backed by deterministic rules for the regular
inflections (-ies→-y, -es, -s, -ing/-ed with silent-e restore and
doubled-consonant undoubling, -er/-est). Unlike a stemmer the output is
always a real word form; unknown forms fall through unchanged.
"""

from __future__ import annotations

from functools import lru_cache

_IRREGULAR = {
    # verbs: past / participle / 3sg → base
    "was": "be", "were": "be", "been": "be", "is": "be", "are": "be",
    "am": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do", "doing": "do",
    "goes": "go", "went": "go", "gone": "go", "going": "go",
    "said": "say", "says": "say", "made": "make", "making": "make",
    "took": "take", "taken": "take", "taking": "take",
    "came": "come", "coming": "come", "saw": "see", "seen": "see",
    "knew": "know", "known": "know", "got": "get", "gotten": "get",
    "getting": "get", "gave": "give", "given": "give", "giving": "give",
    "found": "find", "thought": "think", "told": "tell", "became": "become",
    "left": "leave", "felt": "feel", "brought": "bring", "began": "begin",
    "begun": "begin", "kept": "keep", "held": "hold", "wrote": "write",
    "written": "write", "writing": "write", "stood": "stand",
    "heard": "hear", "let": "let", "meant": "mean", "met": "meet",
    "ran": "run", "running": "run", "paid": "pay", "sat": "sit",
    "spoke": "speak", "spoken": "speak", "lay": "lie", "led": "lead",
    "read": "read", "grew": "grow", "grown": "grow", "lost": "lose",
    "fell": "fall", "fallen": "fall", "sent": "send", "built": "build",
    "understood": "understand", "drew": "draw", "drawn": "draw",
    "broke": "break", "broken": "break", "spent": "spend", "cut": "cut",
    "rose": "rise", "risen": "rise", "drove": "drive", "driven": "drive",
    "bought": "buy", "wore": "wear", "worn": "wear", "chose": "choose",
    "chosen": "choose", "ate": "eat", "eaten": "eat", "taught": "teach",
    "caught": "catch", "sold": "sell", "fought": "fight", "threw": "throw",
    "thrown": "throw", "flew": "fly", "flown": "fly", "swam": "swim",
    "swum": "swim", "sang": "sing", "sung": "sing", "rang": "ring",
    "rung": "ring", "won": "win", "sought": "seek", "slept": "sleep",
    "shot": "shoot", "froze": "freeze", "frozen": "freeze",
    "hid": "hide", "hidden": "hide", "beat": "beat", "beaten": "beat",
    "bent": "bend", "bit": "bite", "bitten": "bite", "blew": "blow",
    "blown": "blow", "burst": "burst", "cost": "cost", "dealt": "deal",
    "dug": "dig", "forgot": "forget", "forgotten": "forget",
    "hung": "hang", "hit": "hit", "hurt": "hurt", "laid": "lay",
    "put": "put", "quit": "quit", "rode": "ride", "ridden": "ride",
    "set": "set", "shook": "shake", "shaken": "shake", "shut": "shut",
    "spread": "spread", "stole": "steal", "stolen": "steal",
    "struck": "strike", "swore": "swear", "sworn": "swear",
    "tore": "tear", "torn": "tear", "woke": "wake", "woken": "wake",
    # nouns: irregular plurals → singular
    "children": "child", "men": "man", "women": "woman", "people": "person",
    "feet": "foot", "teeth": "tooth", "mice": "mouse", "geese": "goose",
    "oxen": "ox", "lives": "life", "wives": "wife", "knives": "knife",
    "leaves": "leaf", "halves": "half", "shelves": "shelf",
    "wolves": "wolf", "selves": "self", "loaves": "loaf",
    "criteria": "criterion", "phenomena": "phenomenon", "data": "datum",
    "analyses": "analysis", "bases": "basis", "crises": "crisis",
    "theses": "thesis", "hypotheses": "hypothesis", "indices": "index",
    "matrices": "matrix", "vertices": "vertex", "appendices": "appendix",
    # comparatives / superlatives
    "better": "good", "best": "good", "worse": "bad", "worst": "bad",
    "more": "much", "most": "much", "less": "little", "least": "little",
    "further": "far", "farther": "far", "furthest": "far",
    "farthest": "far", "elder": "old", "eldest": "old",
}

# words whose surface form looks inflected but is not
_NO_CHANGE = frozenset(
    ["as", "is", "his", "this", "us", "thus", "yes", "its", "was",
     "news", "series", "species", "physics", "mathematics", "analysis",
     "basis", "crisis", "bus", "gas", "lens", "bias", "canvas", "chaos",
     "always", "perhaps", "during", "spring", "string", "thing", "king",
     "ring", "wing", "song", "being", "morning", "evening", "nothing",
     "something", "anything", "everything", "sing", "bring",
     "red", "bed", "led", "wed", "shed", "bred", "sled", "need", "seed",
     "feed", "speed", "deed", "breed", "bleed", "greed", "indeed",
     "hundred", "sacred", "naked", "wicked", "rugged", "ragged",
     "crooked", "wretched", "blessed", "beloved",
     "her", "per", "under", "over", "after", "never", "ever", "other",
     "another", "either", "neither", "whether", "rather", "together",
     "water", "paper", "number", "member", "order", "offer", "matter",
     "letter", "chapter", "center", "master", "mister", "winter",
     "summer", "super", "upper", "inner", "outer", "former", "latter"])

_VOWELS = "aeiou"


def _vowel_groups(stem: str) -> int:
    n, prev = 0, False
    for ch in stem:
        v = ch in _VOWELS or ch == "y"
        if v and not prev:
            n += 1
        prev = v
    return n


def _restore_e(stem: str) -> str:
    """After stripping -ing/-ed: bare stem vs silent-e restore vs
    doubled-consonant undoubling. Heuristics (documented misses:
    'controlled'→controll-style British l-doubling):

    - doubled final consonant (except s/z/l/f whose doubling is lexical:
      miss, buzz, fill, stuff) → undouble: running→run, stopped→stop;
    - final -ng / -w/-x/-y → bare: singing→sing, fixed→fix, played→play;
    - final -c → +e (dance, face: bare final c is rare in English);
    - monosyllabic consonant-vowel-consonant → +e: making→make,
      hoped→hope (polysyllables stay bare: opened→open, visited→visit);
    - otherwise bare: helped→help, asked→ask.
    """
    if len(stem) >= 3 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS \
            and stem[-1] not in "szlf":
        return stem[:-1]
    if stem.endswith("ng") or stem[-1] in "wxy" or stem[-1] in _VOWELS:
        return stem
    if stem[-1] == "c":
        return stem + "e"
    if (len(stem) >= 3 and stem[-2] in _VOWELS
            and stem[-3] not in _VOWELS and _vowel_groups(stem) == 1):
        return stem + "e"
    return stem


@lru_cache(maxsize=262_144)
def lemmatize(token: str) -> str:
    """Lemma of an English ``token`` (lowercased). Irregulars via lookup,
    regular inflections via rules; unknown shapes pass through."""
    w = token.lower()
    hit = _IRREGULAR.get(w)
    if hit is not None:
        return hit
    if len(w) <= 2 or w in _NO_CHANGE:
        return w
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"                      # studies → study
    if w.endswith("sses") or w.endswith("shes") or w.endswith("ches") \
            or w.endswith("xes") or w.endswith("zes"):
        return w[:-2]                            # boxes → box
    if w.endswith("s") and not w.endswith(("ss", "us", "is")) and len(w) > 3:
        return w[:-1]                            # cats → cat
    if w.endswith("ing") and len(w) > 5:
        return _restore_e(w[:-3])                # running → run
    if w.endswith("ied") and len(w) > 4:
        return w[:-3] + "y"                      # tried → try
    if w.endswith("ed") and len(w) > 4:
        return _restore_e(w[:-2])                # stopped → stop
    if w.endswith("iest") and len(w) > 5:
        return w[:-4] + "y"                      # happiest → happy
    if w.endswith("ier") and len(w) > 4:
        return w[:-3] + "y"                      # happier → happy
    return w
