"""NLTK-default-mode Porter golden vectors (shared by tests and the
driver's porter_stem_golden query).

Expected values are NLTK PorterStemmer(NLTK_EXTENSIONS) outputs for the
classic Porter 1980 vocabulary plus every NLTK-documented extension point
(irregular pool, ies/ied length-4, y->i consonant rule, bli/fulli/logi,
alli recursion, length<=2 guard) — the exact stemmer the reference calls
(/root/reference/src/data/utils.py:56-61). The authority of these
constants is external (NLTK's documented behavior), not this repo's
implementation.
"""

GOLDEN = {
    # irregular-forms pool (NLTK extension)
    "dying": "die", "lying": "lie", "tying": "tie",
    "skies": "sky", "sky": "sky", "news": "news",
    "innings": "inning", "inning": "inning", "outing": "outing",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
    "howe": "howe",
    # length <= 2 guard (NLTK extension)
    "a": "a", "is": "is", "by": "by", "at": "at",
    # step 1a (+ NLTK 4-letter ies rule)
    "caresses": "caress", "ponies": "poni", "ties": "tie", "dies": "die",
    "flies": "fli", "sties": "sti", "caress": "caress", "cats": "cat",
    # step 1b (+ NLTK ied rule)
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "died": "die", "spied": "spi", "tried": "tri",
    # step 1c (NLTK consonant-preceded y rule)
    "happy": "happi", "enjoy": "enjoy", "cry": "cri", "say": "say",
    "fly": "fli",
    # step 2 (incl. alli recursion, fluently stop-on-failed-condition)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "differently": "differ", "fluently": "fluentli", "formally": "formal",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "generalization": "gener",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "effective": "effect",
    "bowdlerize": "bowdler", "agreement": "agreement",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll", "oscillators": "oscil",
}
