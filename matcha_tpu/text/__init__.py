"""Text frontend: tokenizers, cleaners, symbol tables.

The reference exposes three tokenization behaviors (see SURVEY.md §7 "Two tokenizers"):

1. `text_to_sequence` — full keithito pipeline with curly-brace ARPAbet segments, cleaner
   dispatch by name, and an appended EOS id (`/root/reference/matcha/text_to_ID/__init__.py:14`).
2. `simple_text_to_sequence` — lowercase + direct char->id, no cleaners, no EOS
   (`/root/reference/matcha/text_to_ID/text_to_sequence.py:6`); what the reference
   inference scripts actually call.
3. Training-data path — `english_cleaners` then char->id, unknown chars dropped, no EOS
   (`/root/reference/matcha/data_management/ljspeechDataset.py:25-26`); exposed here as
   `train_text_to_sequence`.
"""

import re

from matcha_tpu.text import cleaners
from matcha_tpu.text.cleaners import english_cleaners
from matcha_tpu.text.symbols import EOS, EOS_ID, ID_TO_SYMBOL, PAD, SYMBOL_TO_ID, symbols

_curly_re = re.compile(r"(.*?)\{(.+?)\}(.*)")

__all__ = [
    "symbols",
    "text_to_sequence",
    "sequence_to_text",
    "simple_text_to_sequence",
    "train_text_to_sequence",
    "cleaners",
]


def text_to_sequence(text, cleaner_names):
    """Full tokenizer: cleaners by name, `{ARPAbet}` segments, EOS appended."""
    sequence = []
    while len(text):
        m = _curly_re.match(text)
        if not m:
            sequence += _symbols_to_sequence(_clean_text(text, cleaner_names))
            break
        sequence += _symbols_to_sequence(_clean_text(m.group(1), cleaner_names))
        sequence += _arpabet_to_sequence(m.group(2))
        text = m.group(3)
    sequence.append(EOS_ID)
    return sequence


def sequence_to_text(sequence):
    """Inverse of `text_to_sequence`; ARPAbet ids are re-wrapped in curly braces."""
    result = ""
    for symbol_id in sequence:
        if symbol_id in ID_TO_SYMBOL:
            s = ID_TO_SYMBOL[symbol_id]
            if len(s) > 1 and s[0] == "@":
                s = "{%s}" % s[1:]
            result += s
    return result.replace("}{", " ")


def simple_text_to_sequence(text, cleaner_names=None):
    """Simplified tokenizer: lowercase + direct char map, silently drops unknowns.

    No cleaners, no EOS — mirrors what the reference inference scripts call.
    """
    del cleaner_names  # accepted for API compatibility, unused
    clean_text = text.lower()
    return [SYMBOL_TO_ID[ch] for ch in clean_text if ch in SYMBOL_TO_ID]


def train_text_to_sequence(text):
    """Training-data tokenizer: english_cleaners then char->id, no EOS."""
    clean = english_cleaners(text)
    return [SYMBOL_TO_ID[ch] for ch in clean if ch in SYMBOL_TO_ID]


def _clean_text(text, cleaner_names):
    for name in cleaner_names:
        cleaner = getattr(cleaners, name, None)
        if cleaner is None:
            raise ValueError(f"Unknown cleaner: {name}")
        text = cleaner(text)
    return text


def _symbols_to_sequence(syms):
    return [SYMBOL_TO_ID[s] for s in syms if _should_keep_symbol(s)]


def _arpabet_to_sequence(text):
    return _symbols_to_sequence(["@" + s for s in text.split()])


def _should_keep_symbol(s):
    return s in SYMBOL_TO_ID and s != PAD and s != EOS
