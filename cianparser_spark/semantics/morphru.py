"""Russian city-name case normalization — the pymorphy2 stand-in.

The reference's city definer lowercases the site title ("Снять
квартиру в Москве…"), extracts the PREPOSITIONAL-case city and maps it
to its nominative via ``pymorphy2.MorphAnalyzer().parse(city)[0]
.normal_form`` (reference definers/definer_cities_id.py:52-54) — a
dictionary-based morphological analyzer this sandbox doesn't ship.

This module is the scoped replacement: a rule-based prepositional-case
GENERATOR over the known 156-city vocabulary (dims_data — the exact
universe the definer can ever emit) plus the REVERSE lookup the
definer needs.  Scope is documented and deliberate: the reference uses
pymorphy2 only to undo the title's case inflection of a city name, so
a generator+reverse-map over the city vocabulary reproduces the
normal-form lookup on every input the pipeline can see; arbitrary-word
lemmatization is out of scope (and out of the reference's use too).

Documented deviation — the trailing ``.title()``: the reference
re-cases the (lowercase) normal form with Python ``str.title()``
(definer_cities_id.py:54), which title-cases EVERY hyphen-separated
segment — its definer would emit 'Ростов-На-Дону' where its own
shipped vocabulary says 'Ростов-на-Дону' (reference constants.py:141,
the only city the two spellings differ on).  This map returns the
vocabulary spelling instead, keeping the definer's output consistent
with the location lookup (U5) that consumes it — reproducing the
reference's internal inconsistency was judged the worse parity break.

Declension rules (standard Russian prepositional, "в …"):
* adjective-form words: -ний→-нем, -ый/-ий→-ом, -ое→-ом, -ые→-ых
  (Нижний→Нижнем, Грозный→Грозном, Видное→Видном, Набережные→Набережных)
* -а/-я → -е (Москва→Москве, Лобня→Лобне)
* plural -ы/-и → -ах (Люберцы→Люберцах, Химки→Химках, Мытищи→Мытищах)
* feminine -ь → -и (Казань→Казани, Тверь→Твери, Пермь→Перми);
  masculine -ль → -е (Ярославль→Ярославле, Ставрополь→Ставрополе)
* -о/-ё → -е (Кемерово→Кемерове, Щёлково→Щёлкове)
* -й → -е (Аксай→Аксае); consonant → +е (Новосибирск→Новосибирске)
* indeclinable finals -э/-у (Улан-Удэ)
* hyphenated names decline the last segment; when that segment is
  adjectival the consonant-final first segment declines too
  (Петропавловск-Камчатский→Петропавловске-Камчатском)
* multi-word names decline adjectival words and the last word
  (Великий Новгород→Великом Новгороде)

Irregulars that rules cannot carry (fleeting vowels, gender
exceptions, indeclinables, data quirks) are pinned in ``EXCEPTIONS``.
``tests/test_definers.py`` locks a hand-checked sample of real forms
so a rule regression is loud.
"""
from __future__ import annotations

from functools import lru_cache

# hand-pinned irregulars over the vocabulary (nominative → prepositional)
EXCEPTIONS = {
    "Сочи": "Сочи",              # indeclinable
    "Тольятти": "Тольятти",      # indeclinable
    "Улан-Удэ": "Улан-Удэ",      # indeclinable
    "Орёл": "Орле",              # fleeting vowel
    "Череповец": "Череповце",    # fleeting vowel
    "Электросталь": "Электростали",  # feminine -ль (сталь)
    "Анадырь": "Анадыре",        # masculine -рь
    "Ростов-на-Дону": "Ростове-на-Дону",  # first part declines
    "Сергиевом Посад": "Сергиевом Посаде",  # vendored-data quirk: first
                                            # word already non-nominative
}

_VOWELS = "аеёиоуыэюя"


def _decline_word(w: str, force_noun: bool = False) -> str:
    """One word → its prepositional form by the rules above."""
    lw = w.lower()
    if not force_noun:
        if lw.endswith("ний"):
            return w[:-2] + "ем"
        if lw.endswith(("ый", "ий")):
            return w[:-2] + "ом"
        if lw.endswith("ое"):
            return w[:-2] + "ом"
        if lw.endswith("ые"):
            return w[:-2] + "ых"
    if lw.endswith(("а", "я")):
        return w[:-1] + "е"
    if lw.endswith(("ы", "и")):
        return w[:-1] + "ах"
    if lw.endswith("ль"):
        return w[:-1] + "е"
    if lw.endswith("ь"):
        return w[:-1] + "и"
    if lw.endswith(("о", "ё")):
        return w[:-1] + "е"
    if lw.endswith("й"):
        return w[:-1] + "е"
    if lw.endswith(("э", "у")):
        return w
    if lw and lw[-1] not in _VOWELS:
        return w + "е"
    return w


def prepositional_form(name: str) -> str:
    """City name (nominative, as vendored) → its prepositional form."""
    if name in EXCEPTIONS:
        return EXCEPTIONS[name]
    if "-" in name:
        parts = name.split("-")
        last = _decline_word(parts[-1])
        head = parts[:-1]
        # adjectival last segment pulls a consonant-final first segment
        # into declension too (Петропавловск-Камчатский)
        if parts[-1].lower().endswith(("ый", "ий")) and head \
                and head[0].lower()[-1] not in _VOWELS + "ь":
            head = [_decline_word(head[0], force_noun=True)] + head[1:]
        return "-".join(head + [last])
    if " " in name:
        return " ".join(_decline_word(p) for p in name.split(" "))
    return _decline_word(name)


@lru_cache(maxsize=None)
def city_normal_map(vocab: tuple[str, ...]) -> dict[str, str]:
    """Reverse lookup table: lowercase observed form → nominative.

    Contains both the prepositional and the nominative spelling of
    every vocabulary name (the definer may see either, depending on
    how the site renders titles); nominative identity entries win any
    collision so a nominative observation is never rewritten."""
    m: dict[str, str] = {}
    for c in vocab:
        m[prepositional_form(c).lower()] = c
    for c in vocab:
        m[c.lower()] = c
    return m


def default_vocab() -> tuple[str, ...]:
    from cianparser_spark import dims_data

    return tuple(dims_data.CITIES) + tuple(dims_data.OTHER_CITIES)


def normal_form_city(observed: str) -> str:
    """The pure-Python twin of the definer's normalization expression:
    lowercase-lookup into the vocabulary map, identity fallback (the
    reference's normal_form is likewise identity on anything already
    nominative)."""
    return city_normal_map(default_vocab()).get(observed.lower(), observed)
