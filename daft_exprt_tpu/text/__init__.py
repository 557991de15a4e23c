from daft_exprt_tpu.text.symbols import (
    symbols_english, pad, eos, whitespace, punctuation, ascii_letters,
    arpabet_stressed, SIL_WORD_SYMBOL, SIL_PHONE_SYMBOL,
    MFA_SIL_WORD_SYMBOL, MFA_SIL_PHONE_SYMBOLS, MFA_UNK_WORD_SYMBOL,
    MFA_UNK_PHONE_SYMBOL,
)
from daft_exprt_tpu.text.cleaners import text_cleaner, english_cleaners, collapse_whitespace
