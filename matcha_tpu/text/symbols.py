"""Symbol inventory for text input.

Same 150-symbol inventory as the reference (`/root/reference/matcha/text_to_ID/symbols.py:18`
and `cmudict.py:4-12`): pad `_` (id 0), eos `~` (id 1), `<unk>` (id 2), 52 ASCII letters,
11 punctuation characters including space, and 84 ARPAbet symbols prefixed with `@`.
"""

from matcha_tpu.text.cmudict import valid_symbols

PAD = "_"
EOS = "~"
UNK = "<unk>"

_characters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz!'(),-.:;? "

# ARPAbet symbols are prefixed with '@' so they never collide with uppercase letters.
_arpabet = ["@" + s for s in valid_symbols]

symbols = [PAD, EOS, UNK] + list(_characters) + _arpabet

SYMBOL_TO_ID = {s: i for i, s in enumerate(symbols)}
ID_TO_SYMBOL = {i: s for i, s in enumerate(symbols)}

PAD_ID = SYMBOL_TO_ID[PAD]
EOS_ID = SYMBOL_TO_ID[EOS]
UNK_ID = SYMBOL_TO_ID[UNK]
