"""Text frontend tests.

Test vectors replicate the reference suite (`/root/reference/matcha/tests_text/`) so the
new frontend is id-for-id and word-for-word compatible.
"""

import io

from matcha_tpu.text import (
    cleaners,
    sequence_to_text,
    simple_text_to_sequence,
    symbols,
    text_to_sequence,
    train_text_to_sequence,
)
from matcha_tpu.text import cmudict
from matcha_tpu.text.numbers import normalize_numbers


def test_symbols():
    assert len(symbols) == 150
    assert symbols[0] == "_"
    assert symbols[1] == "~"
    assert symbols[2] == "<unk>"


# NOTE: the reference's committed test vectors (`tests_text/text_test.py:15-27`) use
# keithito's ORIGINAL 2-prefix symbol table ('_','~'), but the reference's own
# `symbols.py` inserts '<unk>' at index 2, shifting every later id by +1 — i.e. the
# reference's tests fail against its own table. The MODEL is trained with the
# 150-symbol table (n_vocab=150, `train.py:77`), so these vectors are the reference
# vectors shifted to the table the pipeline actually uses.
def test_text_to_sequence():
    assert text_to_sequence("", []) == [1]
    assert text_to_sequence("Hi!", []) == [10, 37, 55, 1]
    assert text_to_sequence('"A"_B', []) == [3, 4, 1]
    assert text_to_sequence("A {AW1 S} B", []) == [3, 65, 84, 133, 65, 4, 1]
    assert text_to_sequence("Hi", ["lowercase"]) == [36, 37, 1]
    assert text_to_sequence("A {AW1 S}  B", ["english_cleaners"]) == [29, 65, 84, 133, 65, 30, 1]


def test_sequence_to_text():
    assert sequence_to_text([]) == ""
    assert sequence_to_text([1]) == "~"
    assert sequence_to_text([10, 37, 55, 1]) == "Hi!~"
    assert sequence_to_text([3, 65, 84, 133, 65, 4]) == "A {AW1 S} B"


def test_simple_text_to_sequence():
    # Simplified tokenizer: lowercase + char map, no EOS, unknowns dropped.
    assert simple_text_to_sequence("Hi!") == [36, 37, 55]
    assert simple_text_to_sequence("héllo")  # 'é' dropped, no crash


def test_train_text_to_sequence():
    # Training path: english_cleaners then char map, no EOS.
    seq = train_text_to_sequence("Mr. Smith has 2 cats")
    assert seq == [
        symbols.index(c) for c in "mister smith has two cats"
    ]


def test_collapse_whitespace():
    assert cleaners.collapse_whitespace("") == ""
    assert cleaners.collapse_whitespace("  ") == " "
    assert cleaners.collapse_whitespace("x") == "x"
    assert cleaners.collapse_whitespace(" x.  y,  \tz") == " x. y, z"


def test_convert_to_ascii():
    assert cleaners.convert_to_ascii("raison d'être") == "raison d'etre"
    assert cleaners.convert_to_ascii("grüß gott") == "gruss gott"
    assert cleaners.convert_to_ascii("안녕") == "annyeong"
    assert cleaners.convert_to_ascii("Здравствуйте") == "Zdravstvuite"


def test_lowercase():
    assert cleaners.lowercase("Happy Birthday!") == "happy birthday!"
    assert cleaners.lowercase("CAFÉ") == "café"


def test_expand_abbreviations():
    assert cleaners.expand_abbreviations("mr. and mrs. smith") == "mister and misess smith"


def test_expand_numbers():
    assert cleaners.expand_numbers("3 apples and 44 pears") == "three apples and forty-four pears"
    assert cleaners.expand_numbers("$3.50 for gas.") == "three dollars, fifty cents for gas."


def test_cleaner_pipelines():
    text = "Mr. Müller ate  2 Apples"
    assert cleaners.english_cleaners(text) == "mister muller ate two apples"
    assert cleaners.transliteration_cleaners(text) == "mr. muller ate 2 apples"
    assert cleaners.basic_cleaners(text) == "mr. müller ate 2 apples"


def test_normalize_numbers():
    assert normalize_numbers("1") == "one"
    assert normalize_numbers("15") == "fifteen"
    assert normalize_numbers("24") == "twenty-four"
    assert normalize_numbers("100") == "one hundred"
    assert normalize_numbers("101") == "one hundred one"
    assert normalize_numbers("456") == "four hundred fifty-six"
    assert normalize_numbers("1000") == "one thousand"
    assert normalize_numbers("1800") == "eighteen hundred"
    assert normalize_numbers("2,000") == "two thousand"
    assert normalize_numbers("3000") == "three thousand"
    assert normalize_numbers("18000") == "eighteen thousand"
    assert normalize_numbers("24,000") == "twenty-four thousand"
    assert normalize_numbers("124,001") == "one hundred twenty-four thousand one"
    assert normalize_numbers("6.4 sec") == "six point four sec"


def test_normalize_ordinals():
    assert normalize_numbers("1st") == "first"
    assert normalize_numbers("2nd") == "second"
    assert normalize_numbers("9th") == "ninth"
    assert normalize_numbers("243rd place") == "two hundred and forty-third place"


def test_normalize_dates():
    assert normalize_numbers("1400") == "fourteen hundred"
    assert normalize_numbers("1901") == "nineteen oh one"
    assert normalize_numbers("1999") == "nineteen ninety-nine"
    assert normalize_numbers("2000") == "two thousand"
    assert normalize_numbers("2004") == "two thousand four"
    assert normalize_numbers("2010") == "twenty ten"
    assert normalize_numbers("2012") == "twenty twelve"
    assert normalize_numbers("2025") == "twenty twenty-five"
    assert normalize_numbers("September 11, 2001") == "September eleven, two thousand one"
    assert normalize_numbers("July 26, 1984.") == "July twenty-six, nineteen eighty-four."


def test_normalize_money():
    assert normalize_numbers("$0.00") == "zero dollars"
    assert normalize_numbers("$1") == "one dollar"
    assert normalize_numbers("$10") == "ten dollars"
    assert normalize_numbers("$.01") == "one cent"
    assert normalize_numbers("$0.25") == "twenty-five cents"
    assert normalize_numbers("$5.00") == "five dollars"
    assert normalize_numbers("$5.01") == "five dollars, one cent"
    assert normalize_numbers("$135.99.") == "one hundred thirty-five dollars, ninety-nine cents."
    assert normalize_numbers("$40,000") == "forty thousand dollars"
    assert normalize_numbers("for £2500!") == "for twenty-five hundred pounds!"


CMUDICT_TEST_DATA = """
;;; # CMUdict  --  Major Version: 0.07
)PAREN  P ER EH N
'TIS  T IH Z
ADVERSE  AE0 D V ER1 S
ADVERSE(1)  AE1 D V ER2 S
ADVERSE(2)  AE2 D V ER1 S
ADVERSELY  AE0 D V ER1 S L IY0
ADVERSITY  AE0 D V ER1 S IH0 T IY2
BARBERSHOP  B AA1 R B ER0 SH AA2 P
YOU'LL  Y UW1 L
"""


def test_cmudict():
    c = cmudict.CMUDict(io.StringIO(CMUDICT_TEST_DATA))
    assert len(c) == 6
    assert len(cmudict.valid_symbols) == 84
    assert c.lookup("ADVERSITY") == ["AE0 D V ER1 S IH0 T IY2"]
    assert c.lookup("BarberShop") == ["B AA1 R B ER0 SH AA2 P"]
    assert c.lookup("You'll") == ["Y UW1 L"]
    assert c.lookup("'tis") == ["T IH Z"]
    assert c.lookup("adverse") == ["AE0 D V ER1 S", "AE1 D V ER2 S", "AE2 D V ER1 S"]
    assert c.lookup("") is None
    assert c.lookup("foo") is None
    assert c.lookup(")paren") is None


def test_cmudict_no_keep_ambiguous():
    c = cmudict.CMUDict(io.StringIO(CMUDICT_TEST_DATA), keep_ambiguous=False)
    assert len(c) == 5
    assert c.lookup("adversity") == ["AE0 D V ER1 S IH0 T IY2"]
    assert c.lookup("adverse") is None


def test_cmudict_real_file():
    c = cmudict.CMUDict()
    assert len(c) > 100_000
    assert c.lookup("HELLO") == ["HH AH0 L OW1", "HH EH0 L OW1"]
