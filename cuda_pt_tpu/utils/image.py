"""Image I/O helpers (replaces the reference's stb usage,
src/impl/textures.cu:172-201).

Formats: PNG/JPG/BMP/TIFF via PIL, plus a native Radiance ``.hdr`` (RGBE)
decoder with new-style RLE support — stb_image reads those for the
reference's envmaps (src/impl/textures.cu:172-201); PIL cannot, so we parse
the format directly.
"""

from __future__ import annotations

import numpy as np


def srgb_to_linear(x: np.ndarray) -> np.ndarray:
    x = np.clip(x, 0.0, 1.0)
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def _decode_rgbe(rgbe: np.ndarray) -> np.ndarray:
    """(…, 4) uint8 RGBE → (…, 3) float32 linear radiance (stb convention:
    rgb = mantissa * 2^(e-136); e==0 ⇒ black)."""
    rgbe = rgbe.astype(np.float32)
    e = rgbe[..., 3]
    scale = np.where(e > 0.0, np.exp2(e - 136.0), 0.0)
    return (rgbe[..., :3] * scale[..., None]).astype(np.float32)


def _load_hdr(path: str) -> np.ndarray:
    """Radiance RGBE `.hdr` → float32 (H, W, 3) linear radiance."""
    with open(path, "rb") as f:
        data = f.read()
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")
    # header: lines until a blank line, then the resolution line
    pos = 0
    while True:
        eol = data.index(b"\n", pos)
        line = data[pos:eol]
        pos = eol + 1
        if line == b"":
            break
    eol = data.index(b"\n", pos)
    res = data[pos:eol].split()
    pos = eol + 1
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"{path}: unsupported HDR orientation {res!r}")
    H, W = int(res[1]), int(res[3])

    buf = np.frombuffer(data, np.uint8, offset=pos)
    out = np.empty((H, W, 4), np.uint8)
    i = 0
    for y in range(H):
        if (
            W >= 8
            and W < 32768
            and buf[i] == 2
            and buf[i + 1] == 2
            and (int(buf[i + 2]) << 8 | int(buf[i + 3])) == W
        ):
            # new-style RLE: 4 component planes, each run-length encoded
            i += 4
            for c in range(4):
                x = 0
                while x < W:
                    cnt = int(buf[i])
                    if cnt > 128:  # run of the same byte
                        out[y, x : x + cnt - 128, c] = buf[i + 1]
                        x += cnt - 128
                        i += 2
                    else:  # literal dump
                        out[y, x : x + cnt, c] = buf[i + 1 : i + 1 + cnt]
                        x += cnt
                        i += 1 + cnt
        else:
            # flat (or old-style) scanline: W raw RGBE pixels
            row = buf[i : i + 4 * W].reshape(W, 4)
            out[y] = row
            i += 4 * W
    return _decode_rgbe(out)


def load_image(path: str, to_linear: bool = True) -> np.ndarray:
    """Load an image → float32 (H, W, C).

    LDR inputs (8/16-bit) are normalized to [0,1] by their ORIGINAL bit
    depth (checked before the float cast — a float TIFF with values > 2 is
    HDR data and must not be quantization-divided) and optionally converted
    sRGB→linear. ``.hdr`` files decode to linear radiance directly.
    """
    if path.lower().endswith(".hdr"):
        return np.ascontiguousarray(_load_hdr(path))

    from PIL import Image

    img = Image.open(path)
    raw = np.asarray(img)
    orig_dtype = raw.dtype
    arr = raw.astype(np.float32)
    if orig_dtype == np.uint8:
        arr /= 255.0
    elif orig_dtype == np.uint16:
        arr /= 65535.0
    else:
        # float source (e.g. 32-bit TIFF): already radiometric, no transfer
        to_linear = False
    if arr.ndim == 2:
        arr = arr[..., None]
    if to_linear:
        arr = srgb_to_linear(arr)
    return np.ascontiguousarray(arr, dtype=np.float32)


def save_png(path: str, img: np.ndarray):
    """Save (H, W, 3) float [0,1] or uint8 image as PNG."""
    from PIL import Image

    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(img).save(path)
