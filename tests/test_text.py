from daft_exprt_tpu.text.cleaners import english_cleaners, text_cleaner
from daft_exprt_tpu.text.numbers import (
    normalize_numbers, number_to_words, ordinal_to_words,
)
from daft_exprt_tpu.text.symbols import pad, symbols_english


def test_symbol_table():
    assert len(symbols_english) == 76
    assert symbols_english.index(pad) == 0
    assert symbols_english[1] == '~'
    assert symbols_english[2] == ' '
    assert symbols_english[3:7] == [',', '.', '!', '?']
    assert len(set(symbols_english)) == 76


def test_number_to_words():
    assert number_to_words(0) == 'zero'
    assert number_to_words(7) == 'seven'
    assert number_to_words(21) == 'twenty-one'
    assert number_to_words(100) == 'one hundred'
    assert number_to_words(105) == 'one hundred five'
    assert number_to_words(1234) == 'one thousand two hundred thirty-four'
    assert number_to_words(1000000) == 'one million'


def test_ordinals():
    assert ordinal_to_words(1) == 'first'
    assert ordinal_to_words(2) == 'second'
    assert ordinal_to_words(3) == 'third'
    assert ordinal_to_words(12) == 'twelfth'
    assert ordinal_to_words(21) == 'twenty-first'
    assert ordinal_to_words(30) == 'thirtieth'
    assert ordinal_to_words(100) == 'one hundredth'


def test_normalize_numbers():
    assert normalize_numbers('I have 3 cats') == 'I have three cats'
    assert normalize_numbers('in 1984 he left') == 'in nineteen eighty-four he left'
    assert normalize_numbers('in 2005') == 'in two thousand five'
    assert normalize_numbers('in 1900') == 'in nineteen hundred'
    assert normalize_numbers('in 1905') == 'in nineteen oh five'
    assert normalize_numbers('$5.50 please') == \
        'five dollars, fifty cents please'
    assert normalize_numbers('3.14 pie') == 'three point fourteen pie'
    assert normalize_numbers('the 2nd time') == 'the second time'
    # 1000 < n < 3000 uses the year-style reading, as the reference does
    # (reference: src/daft_exprt/normalize_numbers.py:55-65)
    assert normalize_numbers('1,234 items') == 'twelve thirty-four items'
    assert normalize_numbers('4,234 items') == ('four thousand two hundred '
                                                'thirty-four items')


def test_english_cleaners():
    assert english_cleaners('Hello,  World!') == 'hello, world!'
    assert english_cleaners('Dr. Smith lives on St. James') == \
        'doctor smith lives on saint james'
    assert english_cleaners('well-known fact') == 'well known fact'
    assert english_cleaners('he said: "stop"; then left') == \
        'he said, stop, then left'
    assert english_cleaners('what?!?') == 'what?'
    assert english_cleaners('...leading dots') == 'leading dots'
    out = english_cleaners('café naïve résumé')
    assert out == 'cafe naive resume'


def test_text_cleaner_passthrough():
    assert text_cleaner('abc', 'french') == 'abc'
