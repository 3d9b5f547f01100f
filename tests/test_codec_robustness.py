"""Malformed-input behavior of the real codecs: clear errors, no
silent garbage — what a 100 TB ingest of found media actually needs."""

import numpy as np
import pytest

from sfdata_wrangler_spark.multimodal.image_bmp import (
    decode_bmp24,
    encode_bmp24,
    nn_resize,
    synth_pixels,
)
from sfdata_wrangler_spark.multimodal.video_avi import encode_avi, parse_avi


def test_bmp_rejects_wrong_magic():
    with pytest.raises(ValueError, match="missing 'BM' magic"):
        decode_bmp24(b"PNG....definitely not a bmp")


def test_bmp_rejects_unsupported_depth():
    blob = bytearray(encode_bmp24(synth_pixels(1)))
    blob[28] = 8  # patch bpp field to 8-bit palette
    with pytest.raises(ValueError, match="bpp=8"):
        decode_bmp24(bytes(blob))


def test_bmp_topdown_negative_height():
    """Negative height = top-down row order (valid BMP variant): the
    parser must not flip it."""
    import struct

    img = synth_pixels(5)
    h, w, _ = img.shape
    blob = bytearray(encode_bmp24(img))
    # rewrite height to negative and re-order rows top-down in place
    struct.pack_into("<i", blob, 22, -h)
    row_size = (3 * w + 3) & ~3
    body = bytes(blob[54:])
    rows = [body[i * row_size:(i + 1) * row_size] for i in range(h)]
    blob[54:] = b"".join(reversed(rows))
    back = decode_bmp24(bytes(blob))
    assert np.array_equal(back, img)


def test_avi_rejects_wrong_magic():
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi(b"RIFX....AVI ....")


def test_avi_rejects_missing_headers():
    # a RIFF/AVI shell with no hdrl LIST
    import struct

    body = b"AVI "
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="missing hdrl"):
        parse_avi(blob)


def test_avi_single_frame_roundtrip():
    frame = np.arange(12 * 16 * 3, dtype=np.uint8).reshape(12, 16, 3)
    w, h, fps, n, chunks = parse_avi(encode_avi([frame], fps=1))
    assert (w, h, fps, n, len(chunks)) == (16, 12, 1, 1, 1)


def test_nn_resize_identity_and_upscale():
    img = synth_pixels(2)
    h, w, _ = img.shape
    assert np.array_equal(nn_resize(img, w, h), img)
    up = nn_resize(img, w * 2, h * 2)
    assert up.shape == (h * 2, w * 2, 3)
    assert np.array_equal(up[::2, ::2][: h, : w], img)  # every src pixel kept


def test_xlsx_missing_sheet_name():
    import tempfile

    from sfdata_wrangler_spark.sources.xlsx import read_xlsx_raw, write_xlsx

    path = tempfile.mktemp(suffix=".xlsx")
    write_xlsx(path, {"Only": [["a", 1]]})
    with pytest.raises(KeyError, match="no sheet named"):
        read_xlsx_raw(path, sheet="Missing")


def test_xlsx_roundtrip_property():
    """Property: any grid of floats/ints/strings (incl. XML-special
    and unicode chars) survives write->parse bit-exactly."""
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sfdata_wrangler_spark.sources.xlsx import read_xlsx_raw, write_xlsx

    cell = st.one_of(
        st.none(),
        st.integers(min_value=-10**12, max_value=10**12),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF
            ),
            max_size=40,
        ),
    )

    @settings(max_examples=25, deadline=None)
    @given(
        grid=st.lists(
            st.lists(cell, min_size=1, max_size=6), min_size=1, max_size=8
        )
    )
    def check(grid):
        path = tempfile.mktemp(suffix=".xlsx")
        write_xlsx(path, {"S": grid})
        back = read_xlsx_raw(path, sheet=0)
        width = max(len(r) for r in grid)
        for ri, row in enumerate(grid):
            for ci in range(width):
                want = row[ci] if ci < len(row) else None
                got = back[ri][ci] if ri < len(back) and ci < len(back[ri]) else None
                if isinstance(want, float) and want.is_integer():
                    want = int(want)  # writer emits shortest repr; int-valued
                assert got == want, (ri, ci, want, got)

    check()
