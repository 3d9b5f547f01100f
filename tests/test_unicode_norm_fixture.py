"""The committed Unicode-normalization fixture (plans/catalog36.py)
must stay in lockstep with stdlib ``unicodedata`` ground truth, and
its concatenation into per-document strings must be normalization-safe
— otherwise the txt_nfkc_normalize oracle would state wrong bytes."""

import unicodedata

from sfdata_wrangler_spark.plans.catalog36 import _UN_EXPECTED, _UN_SEQ


def test_fixture_matches_live_unicodedata():
    for form in ("NFKC", "NFD", "NFKD"):
        assert _UN_EXPECTED[form] == unicodedata.normalize(form, _UN_SEQ)


def test_sequence_covers_every_behavior_class():
    # fullwidth fold, ligature, superscript, square unit, fraction,
    # precomposed accent, precomposed Hangul, combining reorder
    for cp in (0xFF21, 0xFB01, 0x00B2, 0x339E, 0x00BD, 0x00E9, 0xD55C, 0x0307):
        assert chr(cp) in _UN_SEQ, hex(cp)
    # NFKC folds compatibility chars but keeps the accent composed
    assert "A1" in _UN_EXPECTED["NFKC"] and "km" in _UN_EXPECTED["NFKC"]
    assert "é" in _UN_EXPECTED["NFKC"]
    # NFD decomposes the accent and the Hangul syllable, keeps fullwidth
    assert "́" in _UN_EXPECTED["NFD"] and "ᄒ" in _UN_EXPECTED["NFD"]
    assert "Ａ" in _UN_EXPECTED["NFD"]
    # canonical reordering: dot-below (ccc 220) before dot-above (ccc 230)
    for form in ("NFKC", "NFD", "NFKD"):
        s = _UN_EXPECTED[form]
        assert s.index("̣") < s.index("̇")


def test_ascii_prefix_concat_is_normalization_safe():
    # the oracle writes 'doc<id> ' || normalize(SEQ); that equals
    # normalize('doc<id> ' || SEQ) — what the engine actually computes
    # — only if SEQ starts at a normalization boundary
    for form in ("NFKC", "NFD", "NFKD", "NFC"):
        for prefix in ("doc0 ", "doc12345 ", ""):
            assert unicodedata.normalize(
                form, prefix + _UN_SEQ
            ) == prefix + unicodedata.normalize(form, _UN_SEQ)


def test_forms_disagree_so_the_query_discriminates():
    # if two forms collapsed to identical strings the oracle columns
    # would not pin them independently
    outs = {form: _UN_EXPECTED[form] for form in ("NFKC", "NFD", "NFKD")}
    assert len(set(outs.values())) == 3
    assert unicodedata.normalize("NFC", _UN_SEQ) not in outs.values()
