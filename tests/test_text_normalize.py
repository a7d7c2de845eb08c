"""Text normalization (qasr_tpu/text/normalize.py): semiotic-class
verbalization goldens per tagger, tag-priority interactions, the
Google/Kaggle dataset loader + accuracy evaluation (reference
tools/text_normalization behavior), and the CLI."""
import pytest

from qasr_tpu.text.normalize import (
    Instance, decimal_words, evaluate_accuracy, load_kaggle_text_norm_file,
    normalize_numbers, ordinal_words, training_data_to_sentences,
    training_data_to_tokens, year_words,
)


@pytest.mark.parametrize("text,expected", [
    # cardinal (tagger.py:279-288)
    ("I saw 11 birds", "I saw eleven birds"),
    ("about 1,234 entrants", "about one thousand two hundred thirty four "
                             "entrants"),
    ("at -5 degrees", "at minus five degrees"),
    # roman numerals (verbalizer.py:58-72; needs >=2 trailing I's or IV/IX)
    ("chapter XIV begins", "chapter fourteen begins"),
    ("Henry VIII ruled", "Henry eight ruled"),
    # ordinal
    ("the 11th hour", "the eleventh hour"),
    ("his 22nd try", "his twenty second try"),
    ("3rd place", "third place"),
    # decimal
    ("pi is 3.14159", "pi is three point one four one five nine"),
    ("a .5 chance", "a point five chance"),
    # money (verbalizer.py:150-203)
    ("It costs $11.50 now", "It costs eleven dollars fifty cents now"),
    ("$2.5 million raised", "two point five million dollars raised"),
    ("paid $1", "paid one dollar"),
    ("about $3k total", "about three thousand dollars total"),
    ("fined £1200", "fined twelve hundred pounds"),
    # measure (verbalizer.py:206-228; <=1 singularizes, '/' becomes 'per')
    ("The dog weighs 12kg", "The dog weighs twelve kilograms"),
    ("0.5 kg of flour", "zero point five kilogram of flour"),
    ("88 mph winds", "eighty eight miles per hour winds"),
    ("5 km/h breeze", "five kilometers per hours breeze"),
    ("took 100%", "took one hundred percent"),
    # time (verbalizer.py:231-250)
    ("Meet at 1:00", "Meet at one o'clock"),
    ("at 10:05 am", "at ten o five a m"),
    ("at 14:59 p.m. sharp", "at fourteen fifty nine p m sharp"),
    ("at 14.59 pm sharp", "at fourteen fifty nine p m sharp"),
    # the dotted-time separator is escaped: '1230 pm' must NOT parse as a
    # 3-char time (it reads as a year/cardinal instead)
    ("at 1230 pm we left", "at twelve thirty pm we left"),
    # date (tagger.py:308-327)
    ("born Aug. 4 1999 .", "born August fourth nineteen ninety nine ."),
    ("on 2010-01-31 it snowed",
     "on the thirty first of January twenty ten it snowed"),
    ("1 December 2013", "the first of December twenty thirteen"),
    ("Jun 2014 release", "June twenty fourteen release"),
    ("in 1905 it began", "in nineteen o five it began"),
    ("by 1900 it ended", "by nineteen hundred it ended"),
    ("since 2000 or 2005", "since two thousand or two thousand five"),
    ("the 1570's were wild", "the fifteen seventies were wild"),
    # whitelist + verbatim
    ("Dr. Smith & Mr. Jones", "Doctor Smith and Mister Jones"),
    ("e.g. 7 items", "for example seven items"),
    # overlapped boundary scanning ('1 2 3': each needs the shared space)
    ("1 2 3", "one two three"),
])
def test_normalize_goldens(text, expected):
    assert normalize_numbers(text) == expected


def test_priority_measure_shadows_date_suffix():
    # '1570s' parses as <1570 seconds> because MEASURE outranks DATE in the
    # reference's tagger order (normalize.py:32-42) — parity, not a bug.
    assert (normalize_numbers("the 1570s began")
            == "the one thousand five hundred seventy seconds began")


def test_word_helpers():
    assert ordinal_words(21) == "twenty first"
    assert ordinal_words(12) == "twelfth"
    assert ordinal_words(40) == "fortieth"
    assert decimal_words("-11.5") == "minus eleven point five"
    assert year_words(1999) == "nineteen ninety nine"
    assert year_words(2007) == "two thousand seven"
    assert year_words(1066) == "ten sixty six"
    assert year_words(987) == "nine hundred eighty seven"


def test_kaggle_format_roundtrip(tmp_path):
    p = tmp_path / "data.tsv"
    p.write_text(
        "PLAIN\tThe\t<self>\n"
        "MEASURE\t12kg\ttwelve kilograms\n"
        "PUNCT\t.\tsil\n"
        "<eos>\t<eos>\n"
        "DATE\t2008\ttwo thousand eight\n"
        "<eos>\t<eos>\n")
    data = load_kaggle_text_norm_file(str(p))
    assert [i.token_type for i in data] == ["PLAIN", "MEASURE", "PUNCT",
                                            "EOS", "DATE", "EOS"]
    un, norm = training_data_to_sentences(data)
    assert un == ["The 12kg .", "2008"]
    assert norm == ["The twelve kilograms .", "two thousand eight"]
    tokens = training_data_to_tokens(data)
    assert tokens["MEASURE"] == (["12kg"], ["twelve kilograms"])
    only = training_data_to_tokens(data, category="DATE")
    assert list(only) == ["DATE"]


def test_evaluate_accuracy():
    preds = ["Twelve Kilograms", "wrong"]
    golds = ["twelve kilograms", "right"]
    assert evaluate_accuracy(preds, golds) == 0.5
    assert evaluate_accuracy([], []) == 0.0


def test_token_level_normalization_accuracy():
    # the normalizer should verbalize isolated tokens (the run_evaluate.py
    # token-level mode) correctly for these classes
    samples = {
        "CARDINAL": [("11", "eleven"), ("1,234",
                                        "one thousand two hundred "
                                        "thirty four")],
        "MEASURE": [("12kg", "twelve kilograms")],
        "DATE": [("2008", "two thousand eight")],
        "TIME": [("10:05 am", "ten o five a m")],
        "MONEY": [("$1", "one dollar")],
        "ORDINAL": [("11th", "eleventh")],
    }
    for cls, pairs in samples.items():
        for un, gold in pairs:
            assert normalize_numbers(un) == gold, (cls, un)


def test_cli_predict_and_evaluate(tmp_path, capsys):
    from qasr_tpu.cli.normalize_text import main

    inp = tmp_path / "in.txt"
    out = tmp_path / "out.txt"
    inp.write_text("I saw 11 birds\nat 1:00\n")
    main(["--input", str(inp), "--output", str(out)])
    assert out.read_text().splitlines() == ["I saw eleven birds",
                                            "at one o'clock"]

    tsv = tmp_path / "eval.tsv"
    tsv.write_text("PLAIN\tweighs\t<self>\n"
                   "MEASURE\t12kg\ttwelve kilograms\n"
                   "<eos>\t<eos>\n")
    main(["--evaluate", "--input", str(tsv)])
    cap = capsys.readouterr().out
    assert "MEASURE" in cap and "Accuracy: 1.0" in cap
