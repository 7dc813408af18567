"""Golden byte vectors: decode EXACT output from FROZEN payload bytes.

ADVICE r4 observed that every codec correctness test routed through the
sibling encoder, so a mirrored encode/decode convention regression
(Adam7 pass order, LZW code-width timing, zigzag order, MCU scatter,
restart resync) would pass CI while failing on real-world files. These
vectors close that hole: the payload bytes below are LITERALS — never
regenerated at test time — and the expected decode output is pinned
exactly (md5 of the full pixel/sample buffer plus a leading-byte
probe). The PNG/GIF conventions they freeze are the ones the round-4
advisor cross-checked byte-exactly against gdk-pixbuf (JPEG within ±1);
the 4:2:0+DRI and WAV-extensible vectors freeze the round-5 wire
conventions the same way. Any future change to either side of a codec
that silently re-defines the wire format now fails HERE, against bytes
no encoder can quietly rewrite.
"""

from __future__ import annotations

import hashlib

from who_focus_crawler_spark.corpus.gif import decode_gif
from who_focus_crawler_spark.corpus.jpeg import decode_jpeg
from who_focus_crawler_spark.corpus.png import decode_png
from who_focus_crawler_spark.corpus.wav import decode_wav

# name -> (payload_hex, (width, height, channels), out_md5, probe0_hex)
# out_md5 is md5 of the full decoded pixel buffer; probe0 the first 8
# decoded bytes — a human-readable canary when the md5 trips.
_IMAGE_VECTORS = {
    # 16×8 gray, depth 8, non-interlaced: pins filter cycle + inflate
    "png_gray": (
        "89504e470d0a1a0a0000000d4948445200000010000000080800000000d51d20"
        "4b0000005a49444154789c6358719c3badf369b1e887dbbc6a1193734c1857ca"
        "bb442bc7f42dbafdda48d2c8fae609264634c01c26b0584f48ffc4a5bc6fb378"
        "a5e4de3e654157c1b0f68c4076dfab0aa9af0f84b46367145a32ae23642800f2"
        "be24e2dba997b20000000049454e44ae426082"
        ,
        (16, 8, 1),
        "467853a54fa3c9eedbb68134af22aede",
        "a8c70b6689e57315",
    ),
    # 16×8 palette depth-4 + tRNS, Adam7 INTERLACED: pins the pass
    # order, sub-byte unpacking and palette/alpha expansion
    "png_pal_adam7": (
        "89504e470d0a1a0a0000000d4948445200000010000000080403000001755f52"
        "3200000030504c544500000011213522426a33639f4484d455a50966c63e77e7"
        "738808a89929ddaa4a12bb6b47cc8c7cddadb1eecee6ffef1bdb51a8a3000000"
        "0474524e538080808069c4d04a0000005449444154789c63686098c170d68761"
        "f31dc6ef920c6bb7eaaf637c289155cf5016bacd8471c6fdc43a26252060ae67"
        "740a6098717c999bccf329571977e9df5f70edf45a47b09c10487ec2cac6c42f"
        "ff33360100907a1e7b9d2478170000000049454e44ae426082"
        ,
        (16, 8, 4),
        "a1d8fd5d2940acd8126d6b4a5ad0bc20",
        "8808a8ff77e773ff",
    ),
    # 16×8 GIF, transparent idx 5, INTERLACED: pins variable-width LZW
    # code timing + the 8/8/4/2 interlace row scatter
    "gif_interlace": (
        "4749463839611000080083000000000011213522426a33639f4484d455a50966"
        "c63e77e7738808a89929ddaa4a12bb6b47cc8c7cddadb1eecee6ffef1b21f904"
        "01000005002c000000001000080040045a109d65521905ac66d06004b33c4a93"
        "1c09f1040a7300889234c8721487d03c71e1188e4680f1582428818f23219021"
        "5c0a03c13074a0088dc242b164203a0307e068781c1a0c8d43d10308368840e2"
        "e1d00118ad1c9634584400003b"
        ,
        (16, 8, 4),
        "11d4b570873df2f2aabd582bea1aaab3",
        "8808a8ff77e773ff",
    ),
    # 16×8 gray baseline 4:4:4: pins zigzag, Annex-K tables, Huffman
    # bit order, byte stuffing, IDCT rounding
    "jpeg_444": (
        "ffd8ffe000104a46494600010100000100010000ffdb004300100b0c0e0c0a10"
        "0e0d0e1211101318281a181616183123251d283a333d3c3933383740485c4e40"
        "4457453738506d51575f626768673e4d71797064785c656763ffc0000b080008"
        "001001011100ffc4001f00000105010101010101000000000000000001020304"
        "05060708090a0bffc400b5100002010303020403050504040000017d01020300"
        "041105122131410613516107227114328191a1082342b1c11552d1f024336272"
        "82090a161718191a25262728292a3435363738393a434445464748494a535455"
        "565758595a636465666768696a737475767778797a838485868788898a929394"
        "95969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9"
        "cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffda"
        "0008010100003f004bb5f935effae49ffa0c7516b2bff13fd6bfdc4ffd016bff"
        "d9"
        ,
        (16, 8, 1),
        "e7879bed45a775caa241a6114d36f934",
        "a6c50b6489ea6918",
    ),
    # 16×16 RGB 4:2:0 with DRI=2 and real RSTn markers: pins MCU
    # assembly order, chroma downsample grid, restart byte-alignment,
    # DC-predictor resets and replication upsampling (round 5)
    "jpeg_420ri": (
        "ffd8ffe000104a46494600010100000100010000ffdb004300100b0c0e0c0a10"
        "0e0d0e1211101318281a181616183123251d283a333d3c3933383740485c4e40"
        "4457453738506d51575f626768673e4d71797064785c656763ffdb0043011112"
        "121815182f1a1a2f634238426363636363636363636363636363636363636363"
        "636363636363636363636363636363636363636363636363636363636363ffc0"
        "0011080010001003012200021101031101ffc4001f0000010501010101010100"
        "000000000000000102030405060708090a0bffc4001f01000301010101010101"
        "01010000000000000102030405060708090a0bffc400b5100002010303020403"
        "050504040000017d01020300041105122131410613516107227114328191a108"
        "2342b1c11552d1f02433627282090a161718191a25262728292a343536373839"
        "3a434445464748494a535455565758595a636465666768696a73747576777879"
        "7a838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6"
        "b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9ea"
        "f1f2f3f4f5f6f7f8f9faffc400b5110002010204040304070504040001027700"
        "0102031104052131061241510761711322328108144291a1b1c109233352f015"
        "6272d10a162434e125f11718191a262728292a35363738393a43444546474849"
        "4a535455565758595a636465666768696a737475767778797a82838485868788"
        "898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4"
        "c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9"
        "faffdd00040002ffda000c03010002110311003f006b9c349b95931c4abd4fba"
        "29f7f94f03d73de9cdb55543a978558f96c170cbc7dc38f5538e7f1e29429711"
        "9567718fdcb9f9be63f75d89e9dc63fd900d3464349242cab260190b81b48ddf"
        "eb0738e0f73d037bd17b6dfd7ebf3fbba0597ddfd75dbe77bfde7fffd9"
        ,
        (16, 16, 3),
        "b50a01186bea1f9cb45b0f7f3c0db114",
        "8b8d9363646b94b3",
    ),
    # 16×16 RGB PROGRESSIVE (SOF2) 4:2:0 with DRI=2: pins the
    # multi-scan layout — DC first at Al=1, DC refinement, AC
    # first scans with EOB runs, AC successive-approximation
    # refinement with buffered correction bits (late round 5)
    "jpeg_prog": (
        "ffd8ffe000104a46494600010100000100010000ffdb004300100b0c0e0c0a10"
        "0e0d0e1211101318281a181616183123251d283a333d3c3933383740485c4e40"
        "4457453738506d51575f626768673e4d71797064785c656763ffdb0043011112"
        "121815182f1a1a2f634238426363636363636363636363636363636363636363"
        "636363636363636363636363636363636363636363636363636363636363ffc2"
        "0011080010001003012200021101031101ffc4001f0000010501010101010100"
        "000000000000000102030405060708090a0bffc4001f01000301010101010101"
        "01010000000000000102030405060708090a0bffc400c31000000000000000b0"
        "000000000000000000102030405060708090a0b0c0d0e0f00102030405060708"
        "090a1112131415161718191a2122232425262728292a3132333435363738393a"
        "4142434445464748494a5152535455565758595a6162636465666768696a7172"
        "737475767778797a8182838485868788898a9192939495969798999aa1a2a3a4"
        "a5a6a7a8a9aab1b2b3b4b5b6b7b8b9bac1c2c3c4c5c6c7c8c9cad1d2d3d4d5d6"
        "d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffdd00040002ffda"
        "000c0301000210031000000145103fffda000c0301000210031000001033ffda"
        "0008010100013f0110974461a88042204384110103a0004234100804035100d4"
        "441008495108d092204c35003fffd01a0d46d1a0844221430425d249c042210f"
        "38001c446118441088040231cc352e174be0f42807ffda0008010200013f0100"
        "ffda0008010300013f0100ffda0008010100013f1010c684804905d8429910c9"
        "92489020428d4e20034008610c0d01a09017634428843424b049001fffd01008"
        "4208842031a1253885d4212e1c440344c0402100100d44034001008442104403"
        "5080e01246848109c4425c1026401fffda0008010200013f101a8d0b81f1160b"
        "50e001ffda0008010300013f101a081a81e712e3046a356a807fffd9"
        ,
        (16, 16, 3),
        "b50a01186bea1f9cb45b0f7f3c0db114",
        "8b8d9363646b94b3",
    ),
}

# 32 samples, stereo, 24-bit WAVE_FORMAT_EXTENSIBLE: pins the fmt-chunk
# layout, channel mask, sub-format GUID and little-endian 24-bit frames
_WAV_VECTOR = (
    "524946469c00000057415645666d742028000000feff020080bb000000650400"
    "0600180016001800000000000100000000001000800000aa00389b7164617461"
    "60000000a82800e64700498bffc3e6ff050a008066002df4ffee95ffe87100f2"
    "5c00438eff7ba7ffccd9ff2615001eeeff05b6ff982a00d64900398dffb3e8ff"
    "f50b007068001df6ffde97ffd87300e25e003390ff6ba9ffbcdbff1617000ef0"
    "fff5b7ff",
    (48000, 32, 2, 24),
    "5f487e0365099029e1031751bda30e2e",
    (10408, 18406),  # first two samples, signed
)


def test_golden_image_vectors_decode_exact():
    dec = {"png": decode_png, "gif": decode_gif, "jpe": decode_jpeg}
    for name, (hx, geom, want_md5, probe0) in _IMAGE_VECTORS.items():
        payload = bytes.fromhex(hx)
        w, h, ch, px = dec[name[:3]](payload)
        assert (w, h, ch) == geom, name
        assert px[:8].hex() == probe0, name
        assert hashlib.md5(px).hexdigest() == want_md5, name


def test_golden_wav_vector_decodes_exact():
    hx, (rate, n, ch, bits), want_md5, first2 = _WAV_VECTOR
    got_rate, got_ch, got_bits, samples = decode_wav(bytes.fromhex(hx))
    assert (got_rate, got_ch, got_bits, len(samples)) == (rate, ch, bits, n)
    assert tuple(samples[:2]) == first2
    buf = b"".join(
        int(s & 0xFFFFFFFF).to_bytes(4, "little") for s in samples
    )
    assert hashlib.md5(buf).hexdigest() == want_md5


def test_golden_payloads_are_not_encoder_outputs_of_today():
    """Meta-guard: the vectors stay meaningful only while they are
    literals. If someone 'helpfully' rewrites them via the encoders,
    this at least documents the intent — the PAYLOAD bytes are the
    contract, pinned at the externally-cross-checked revision."""
    for name, (hx, *_rest) in _IMAGE_VECTORS.items():
        assert bytes.fromhex(hx), name  # literal, parseable, non-empty
