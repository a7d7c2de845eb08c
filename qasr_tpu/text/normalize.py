"""Written -> spoken text normalization (the tools/text_normalization role).

Rule-based tagger + verbalizer for semiotic classes (cardinal, ordinal,
decimal, date, time, money, measure, roman, whitelist, verbatim), matching
the behavior of the reference's tools/text_normalization/{tagger,verbalizer,
normalize,utils}.py — re-implemented self-contained: stdlib ``re`` instead
of the third-party ``regex`` package (overlapped scanning emulated in
``_finditer_overlapped``) and the in-tree ``number_to_words``
(data/parsers.py) instead of ``inflect``.

Reference semantics mirrored (file:line):
- tag regexes + boundaries: tagger.py:112-250
- tagger priority order: normalize.py:32-42 (whitelist > money > measure >
  time > decimal > date > ordinal > cardinal > verbatim)
- first-come non-overlapping tag selection: normalize.py:58-75
- right-to-left span replacement: normalize.py:78-91
- verbalizers: verbalizer.py:48-250 (incl. the year grouping rules
  :98-122 and the money magnitude/cents rules :150-203)
- Kaggle/Google text-normalization dataset loader + accuracy evaluation:
  utils.py:43-167
"""
from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from qasr_tpu.data.parsers import number_to_words

# ---------------------------------------------------------------------------
# number words


def _words(n: int) -> str:
    """Cardinal words in the reference's post-processed form (no 'and',
    no hyphens, no commas — verbalizer.py:82)."""
    return number_to_words(n)


def decimal_words(s: str) -> str:
    """'11.12' -> 'eleven point one two'; '.5' -> 'point five'."""
    s = s.replace(",", "").strip()
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    if "." in s:
        intpart, frac = s.split(".", 1)
    else:
        intpart, frac = s, ""
    out = []
    if neg:
        out.append("minus")
    if intpart:
        out.append(_words(int(intpart)))
    if frac:
        out.append("point")
        out.extend(_words(int(d)) for d in frac)
    return " ".join(out)


_ORDINAL_IRREGULAR = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}


def ordinal_words(n: int) -> str:
    """'11' -> 'eleventh', '21' -> 'twenty first' (hyphens already spaces)."""
    cardinal = _words(n)
    head, _, last = cardinal.rpartition(" ")
    if last in _ORDINAL_IRREGULAR:
        last = _ORDINAL_IRREGULAR[last]
    elif last.endswith("y"):
        last = last[:-1] + "ieth"
    else:
        last = last + "th"
    return (head + " " + last).strip()


def year_words(y: int) -> str:
    """Year reading (verbalizer.py:98-122): 1905 -> 'nineteen o five',
    1999 -> 'nineteen ninety nine', 2000 -> 'two thousand',
    2005 -> 'two thousand five', 1900 -> 'nineteen hundred'."""
    if not (1000 < y < 3000):
        return _words(y)
    if y == 2000:
        return "two thousand"
    if 2000 < y < 2010:
        return "two thousand " + _words(y % 100)
    if y % 100 == 0:
        return _words(y // 100) + " hundred"
    hi, lo = divmod(y, 100)
    lo_words = ("o " + _words(lo)) if lo < 10 else _words(lo)
    return _words(hi) + " " + lo_words


# ---------------------------------------------------------------------------
# data tables (reference tools/text_normalization/data/*.tsv)

CURRENCIES = {"$": "dollar", "£": "pound", "€": "euro",
              "₩": "won"}
MAGNITUDES = {"k": "thousand", "m": "million", "b": "billion",
              "t": "trillion"}
_MAGNITUDE_WORDS = ("trillion", "billion", "million", "thousand", "hundred",
                    "k", "m", "b", "t")
MEASUREMENTS = {
    "f": "fahrenheit", "c": "celsius", "k": "thousand", "km": "kilometers",
    "m": "meters", "cm": "centimeters", "mm": "millimeters", "ha": "hectares",
    "mi": "miles", "m2": "square meters", "km2": "square kilometers",
    "ft": "feet", "%": "percent", "hz": "hertz", "mph": "miles per hour",
    "yrs": "years", "year": "year", "kw": "kilowatts", "hp": "horsepower",
    "mg": "milligrams", "kg": "kilograms", "khz": "kilohertz",
    "mhz": "megahertz", "lb": "pounds", "v": "volts", "h": "hours",
    "mc": "mega coulombs", "s": "seconds", "nm": "nanometers",
    "rpm": "revolutions per minute", "ma": "milli amperes",
}
_MONTH_NAMES = ["January", "February", "March", "April", "May", "June",
                "July", "August", "September", "October", "November",
                "December"]
MONTHS: Dict[str, str] = {}
for _i, _name in enumerate(_MONTH_NAMES, 1):
    MONTHS[str(_i)] = _name
    MONTHS["%02d" % _i] = _name
    MONTHS[_name] = _name
    if _name != "May":  # months.tsv abbreviates everything but May
        MONTHS[_name[:3]] = _name
        MONTHS[_name[:3] + "."] = _name
MONTHS["Sept"] = MONTHS["Sept."] = "September"
WHITELIST = {
    "e.g.": "for example", "E.g.": "For example", "i.e.": "that is",
    "I.e.": "that is", "Dr.": "Doctor", "Mr.": "Mister", "Mrs.": "Misses",
    "Ms.": "Miss",
}

# ---------------------------------------------------------------------------
# tags


@dataclass
class Tag:
    """A detected unnormalized span (tagger.py:64-94)."""
    kind: str
    start: int
    end: int
    verbalize: Callable[[dict], str]
    data: dict = field(default_factory=dict)

    def overlaps(self, other: "Tag") -> bool:
        return (self.start <= other.start < self.end
                or other.start <= self.start < other.end)


_LEFT = r"(^|[\s\(\[\{\<\'\"\`])"
_RIGHT = r"($|(\s|\)|\]|\}|\>|(\'|\"|\`|\.|\,|\;|\:|\?|\!)([^\w]|$)))"


def _make_re(inner: str, flags: int = 0) -> "re.Pattern[str]":
    return re.compile(rf"{_LEFT}(?P<value>{inner}){_RIGHT}", flags)


def _lower_preserving(text: str) -> str:
    """Length-preserving lowercase: characters whose lowercase expands to
    more than one code point (e.g. 'İ' -> 'i̇') keep their original form so
    tag spans computed on the lowered string slice the ORIGINAL correctly."""
    return "".join(c.lower() if len(c.lower()) == 1 else c for c in text)


def _finditer_overlapped(pattern: "re.Pattern[str]", text: str):
    """regex.finditer(..., overlapped=True) emulation: after each match,
    resume scanning one character past the value start, so a boundary
    character consumed by one match can anchor the next ('1 2 3')."""
    pos = 0
    while pos <= len(text):
        m = pattern.search(text, pos)
        if m is None:
            return
        yield m
        pos = m.start("value") + 1


def _re_tags(text: str, kind: str, verbalize, pattern) -> List[Tag]:
    return [Tag(kind=kind, start=m.start("value"), end=m.end("value"),
                verbalize=verbalize, data=m.groupdict())
            for m in _finditer_overlapped(pattern, text)]


# regexes (tagger.py:112-250)
_HOUR = r"[0-1]?[0-9]|2[0-3]"
_MONTH_NUM = r"0?[1-9]|1[012]"
_MONTH_NAME = (r"(Jan|Feb|Mar|Apr|Jun|Jul|Aug|Sept|Sep|Oct|Nov|Dec)\.?|"
               r"January|February|March|April|May|June|July|August|"
               r"September|October|November|December")
_YEAR = r"\d{4}"
_DAY = r"0?[1-9]|[12][0-9]|3[01]"
_CURRENCY = "(" + "|".join(map(re.escape, CURRENCIES)) + ")"
_MAGNITUDE = r"k|m|b|t|hundred|thousand|million|billion|trillion"
_MEASURE = "(" + "|".join(map(re.escape, MEASUREMENTS)) + ")"
_MEASURE_DECIMAL = r"(\d+(\,\d+)*(\.(\d+))?|\.(\d+))"
_ROMAN = r"M{0,4}(CM|CD|D?C{0,3})(XC|XL|L?X{0,3})(IX|IV|V?I{2,3})"
_MINUTES = r"[0-5][0-9]"
_TIME_SUFFIX = r"(a\.m\.|am|pm|p\.m\.)"

RE_WHITELIST = _make_re("(" + "|".join(map(re.escape, WHITELIST)) + ")")
RE_CARDINAL = _make_re(r"-?(\d+)(\,[0-9]+)*")
RE_ORDINAL = _make_re(r"(?P<number>[0-9]+)(st|nd|rd|th)")
RE_ROMAN = _make_re(_ROMAN)
RE_DECIMAL = _make_re(r"-?(\d+(\,\d+)*)\.(\d+)")
RE_DECIMAL2 = _make_re(r"-?\.\d+")
RE_VERBATIM_AND = _make_re(r"&")
RE_MONEY_MAGNITUDE = _make_re(
    rf"(?P<currency>{_CURRENCY})(?P<integral>(\d+(\,\d+)*))"
    rf"(\.(?P<fractional>\d+))?\s?(?P<magnitude>{_MAGNITUDE})")
RE_MONEY = _make_re(
    rf"(?P<currency>{_CURRENCY})(?P<integral>(\d+(\,\d+)*))"
    rf"(\.(?P<fractional>\d{{2}}))?")
RE_DATE_YMD = _make_re(
    rf"(?P<year>{_YEAR})(?P<sep>[- /.])(?P<month>{_MONTH_NUM})"
    rf"(?P=sep)(?P<day>{_DAY})")
RE_DATE_MDY = _make_re(
    rf"(?P<month>{_MONTH_NAME})\s(?P<day>{_DAY}),?\s(?P<year>{_YEAR})")
RE_DATE_MD = _make_re(rf"(?P<month>{_MONTH_NAME})\s(?P<day>{_DAY})")
RE_DATE_MY = _make_re(rf"(?P<month>{_MONTH_NAME})\s(?P<year>{_YEAR})")
RE_DATE_DMY = _make_re(
    rf"(?P<day>{_DAY})\s(?P<month>{_MONTH_NAME})\s(?P<year>{_YEAR})")
RE_DATE_DM = _make_re(rf"(?P<day>{_DAY})\s(?P<month>{_MONTH_NAME})")
RE_DATE_Y = _make_re(r"(?P<year>[12]\d{3})")
RE_DATE_YS = _make_re(r"(?P<year>[12]\d{3})(?P<suffix>\'?s)")
RE_MEASURE = _make_re(
    rf"(?P<decimal>{_MEASURE_DECIMAL})\s?(?P<measurement>{_MEASURE})")
RE_MEASURE2 = _make_re(
    rf"(?P<decimal>{_MEASURE_DECIMAL})\s?/(?P<measurement2>{_MEASURE})")
RE_MEASURE3 = _make_re(
    rf"(?P<decimal>{_MEASURE_DECIMAL})\s?(?P<measurement>{_MEASURE})"
    rf"/(?P<measurement2>{_MEASURE})")
RE_TIME = _make_re(
    rf"(?P<hour>{_HOUR}):(?P<minutes>{_MINUTES})\s?(?P<suffix>{_TIME_SUFFIX})?")
RE_TIME3 = _make_re(
    rf"(?P<hour>{_HOUR})\.(?P<minutes>{_MINUTES})\s?(?P<suffix>{_TIME_SUFFIX})")
RE_TIME2 = _make_re(rf"(?P<hour>{_HOUR})\s?(?P<suffix>{_TIME_SUFFIX})")


# ---------------------------------------------------------------------------
# verbalizers (verbalizer.py:48-250)


def expand_whitelist(data: dict) -> str:
    return WHITELIST[data["value"]]


_ROMAN_VALUES = {"I": 1, "V": 5, "X": 10, "L": 50, "C": 100, "D": 500,
                 "M": 1000}


def expand_roman(data: dict) -> str:
    num = data["value"]
    result = 0
    for i, c in enumerate(num):
        if i + 1 == len(num) or _ROMAN_VALUES[c] >= _ROMAN_VALUES[num[i + 1]]:
            result += _ROMAN_VALUES[c]
        else:
            result -= _ROMAN_VALUES[c]
    return _words(result)


def expand_cardinal(data: dict) -> str:
    return _words(int(data["value"].replace(",", "")))


def expand_ordinal(data: dict) -> str:
    return ordinal_words(int(data["value"]))


def expand_decimal(data: dict) -> str:
    return decimal_words(data["value"])


def expand_year(value: str) -> str:
    return year_words(int(value))


def _expand_date(data: dict, verbalize: Callable[..., str]) -> str:
    data = dict(data)
    if data.get("month") in MONTHS:
        data["month"] = MONTHS[data["month"]]
    if data.get("day") is not None:
        data["day"] = ordinal_words(int(data["day"]))
    if data.get("year") is not None:
        data["year"] = expand_year(data["year"])
    keep = {k: v for k, v in data.items()
            if k in ("month", "day", "year", "suffix")}
    return verbalize(**keep).replace("-", " ")


def _expand_hundreds(value: str) -> str:
    number = float(value)
    if 1000 < number < 10000 and number % 100 == 0 and number % 1000 != 0:
        return _words(int(number // 100)) + " hundred"
    return decimal_words(value)


def expand_money(data: dict) -> str:
    currency = CURRENCIES[data["currency"]]
    quantity = data["integral"] + (
        "." + data["fractional"] if data.get("fractional") else "")
    quantity = quantity.replace(",", "")
    magnitude = data.get("magnitude")
    if magnitude is not None and magnitude.lower() in _MAGNITUDE_WORDS:
        if len(magnitude) == 1:
            magnitude = MAGNITUDES[magnitude.lower()]
        return f"{_expand_hundreds(quantity)} {magnitude} {currency}s"
    parts = quantity.split(".")
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1]) if len(parts) > 1 and parts[1] else 0
    dollar_unit = currency if dollars == 1 else currency + "s"
    cent_unit = "cent" if cents == 1 else "cents"
    if dollars and cents:
        return (f"{_expand_hundreds(str(dollars))} {dollar_unit} "
                f"{_words(cents)} {cent_unit}")
    if dollars:
        return f"{_expand_hundreds(str(dollars))} {dollar_unit}"
    if cents:
        return f"{_words(cents)} {cent_unit}"
    return f"zero {currency}s"


def expand_measurement(data: dict) -> str:
    value = float(data["decimal"].replace(",", ""))
    res = decimal_words(data["decimal"])
    if data.get("measurement"):
        measure = MEASUREMENTS[data["measurement"]]
        if value <= 1 and measure.endswith("s"):
            measure = measure[:-1]
        res += " " + measure
    if data.get("measurement2"):
        res += " per " + MEASUREMENTS[data["measurement2"]]
    return res


def expand_time(data: dict) -> str:
    res = _words(int(data["hour"]))
    minutes = data.get("minutes")
    if minutes and int(minutes) != 0:
        if minutes[0] == "0":
            res += " o " + _words(int(minutes))
        else:
            res += " " + _words(int(minutes))
    elif not data.get("suffix"):
        res += " o'clock"
    if data.get("suffix"):
        res += " " + " ".join(data["suffix"].replace(".", ""))
    return res


# ---------------------------------------------------------------------------
# taggers (tagger.py:269-387); priority = list order (normalize.py:32-42)


def tag_whitelist(text: str) -> List[Tag]:
    return _re_tags(text, "WHITELIST", expand_whitelist, RE_WHITELIST)


def tag_money(text: str) -> List[Tag]:
    low = _lower_preserving(text)
    return (_re_tags(low, "MONEY", expand_money, RE_MONEY_MAGNITUDE)
            + _re_tags(low, "MONEY", expand_money, RE_MONEY))


def tag_measure(text: str) -> List[Tag]:
    low = _lower_preserving(text)
    return (_re_tags(low, "MEASURE", expand_measurement, RE_MEASURE3)
            + _re_tags(low, "MEASURE", expand_measurement, RE_MEASURE2)
            + _re_tags(low, "MEASURE", expand_measurement, RE_MEASURE))


def tag_time(text: str) -> List[Tag]:
    low = _lower_preserving(text)
    return (_re_tags(low, "TIME", expand_time, RE_TIME)
            + _re_tags(low, "TIME", expand_time, RE_TIME3)
            + _re_tags(low, "TIME", expand_time, RE_TIME2))


def tag_decimal(text: str) -> List[Tag]:
    return (_re_tags(text, "DECIMAL", expand_decimal, RE_DECIMAL)
            + _re_tags(text, "DECIMAL", expand_decimal, RE_DECIMAL2))


def tag_date(text: str) -> List[Tag]:
    out: List[Tag] = []

    def add(pattern, verbalize):
        out.extend(_re_tags(
            text, "DATE",
            lambda data, v=verbalize: _expand_date(data, v), pattern))

    add(RE_DATE_YMD, lambda year, month, day, **_:
        "the " + day + " of " + month + " " + year)
    add(RE_DATE_MDY, lambda year, month, day, **_:
        month + " " + day + " " + year)
    add(RE_DATE_DMY, lambda year, month, day, **_:
        "the " + day + " of " + month + " " + year)
    add(RE_DATE_MD, lambda month, day, **_: month + " " + day)
    add(RE_DATE_MY, lambda year, month, **_: month + " " + year)
    add(RE_DATE_DM, lambda month, day, **_:
        "the " + day + " of " + month)
    add(RE_DATE_YS, lambda year, suffix, **_:
        year[:-1] + "ies" if year.endswith("y") else year + "s")
    add(RE_DATE_Y, lambda year, **_: year)
    return out


def tag_ordinal(text: str) -> List[Tag]:
    return _re_tags(text, "ORDINAL",
                    lambda d: ordinal_words(int(d["number"])), RE_ORDINAL)


def tag_cardinal(text: str) -> List[Tag]:
    return (_re_tags(text, "CARDINAL", expand_cardinal, RE_CARDINAL)
            + _re_tags(text, "CARDINAL", expand_roman, RE_ROMAN))


def tag_verbatim(text: str) -> List[Tag]:
    return _re_tags(text, "VERBATIM", lambda d: "and", RE_VERBATIM_AND)


TAGGERS = [tag_whitelist, tag_money, tag_measure, tag_time, tag_decimal,
           tag_date, tag_ordinal, tag_cardinal, tag_verbatim]


# ---------------------------------------------------------------------------
# pipeline (normalize.py:44-136)


def find_tags(text: str) -> List[Tag]:
    tags: List[Tag] = []
    for tagger in TAGGERS:
        tags.extend(tagger(text))
    return tags


def select_tags(tags: Sequence[Tag]) -> List[Tag]:
    """First-come non-overlapping selection (priority = tagger order)."""
    res: List[Tag] = []
    for tag in tags:
        if not any(existing.overlaps(tag) for existing in res):
            res.append(tag)
    return res


def apply_tags(text: str, tags: Sequence[Tag]) -> str:
    for tag in sorted(tags, key=lambda t: -t.start):
        text = text[:tag.start] + tag.verbalize(tag.data) + text[tag.end:]
    return text


def normalize_numbers(text: str, verbose: bool = False) -> str:
    """'The dog weighs 12kg' -> 'The dog weighs twelve kilograms'."""
    tags = select_tags(find_tags(text))
    out = apply_tags(text, tags)
    if verbose:
        print([f"{t.kind}[{t.start}:{t.end}]" for t in tags])
        print(out)
    return out


def normalize_identity(lines: List[str], verbose: bool = False) -> List[str]:
    return list(lines)


def normalize_nemo(lines: List[str], verbose: bool = False) -> List[str]:
    return [normalize_numbers(line, verbose=verbose) for line in lines]


NORMALIZERS = {"identity": normalize_identity, "nemo": normalize_nemo}


# ---------------------------------------------------------------------------
# Google/Kaggle text-normalization dataset format + evaluation (utils.py)

KNOWN_TYPES = ["PLAIN", "PUNCT", "DATE", "CARDINAL", "LETTERS", "VERBATIM",
               "MEASURE", "DECIMAL", "ORDINAL", "DIGIT", "MONEY", "TELEPHONE",
               "ELECTRONIC", "FRACTION", "TIME", "ADDRESS"]
EOS_TYPE = "EOS"


@dataclass
class Instance:
    token_type: str
    un_normalized: str
    normalized: str


def load_kaggle_text_norm_file(path: str) -> List[Instance]:
    """`<class>\\t<unnormalized>\\t<normalized|self>` lines; `<eos>` rows
    delimit sentences (utils.py:43-76)."""
    res: List[Instance] = []
    with open(path) as fp:
        for line in fp:
            parts = line.strip().split("\t")
            if parts[0] == "<eos>":
                res.append(Instance(EOS_TYPE, "", ""))
            else:
                l_type, l_token, l_normalized = parts
                if l_type in ("PUNCT", "PLAIN"):
                    res.append(Instance(l_type, l_token, l_token))
                else:
                    res.append(Instance(l_type, l_token, l_normalized))
    return res


def training_data_to_sentences(
        data: Sequence[Instance]) -> Tuple[List[str], List[str]]:
    sentences: List[List[Instance]] = []
    sentence: List[Instance] = []
    for inst in data:
        if inst.token_type == EOS_TYPE:
            sentences.append(sentence)
            sentence = []
        else:
            sentence.append(inst)
    un = [" ".join(i.un_normalized for i in s) for s in sentences]
    norm = [" ".join(i.normalized for i in s) for s in sentences]
    return un, norm


def training_data_to_tokens(
        data: Sequence[Instance], category: Optional[str] = None
) -> Dict[str, Tuple[List[str], List[str]]]:
    result: Dict[str, Tuple[List[str], List[str]]] = defaultdict(
        lambda: ([], []))
    for inst in data:
        if inst.token_type != EOS_TYPE and (category is None
                                            or inst.token_type == category):
            result[inst.token_type][0].append(inst.un_normalized)
            result[inst.token_type][1].append(inst.normalized)
    return dict(result)


def evaluate_accuracy(preds: Sequence[str], labels: Sequence[str],
                      inputs: Optional[Sequence[str]] = None,
                      verbose: bool = False) -> float:
    """Case/whitespace-insensitive exact-match accuracy (utils.py:105-127)."""
    acc = 0
    for i, (pred, label) in enumerate(zip(preds, labels)):
        if pred.strip().lower() == label.strip().lower():
            acc += 1
        elif verbose:
            if inputs:
                print(f"inpu: {inputs[i]!r}")
            print(f"gold: {label.strip().lower()!r}")
            print(f"pred: {pred.strip().lower()!r}")
    return acc / max(len(preds), 1)
