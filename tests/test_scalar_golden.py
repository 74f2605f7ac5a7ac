"""Hand-derived golden vectors for the scalar oracle.

Pin the reference quirks called out in SURVEY.md §4/§7: bit-reader
accumulator behavior (AlacFile.cs:101-152), Rice escape (:199-202),
zero-run blocks with sign_modifier carry (:231-249), the order-31
predictor (:268-282) and the adaptive coefficient walk (:312-332).
"""

import numpy as np

from alacnet_tpu.codec.scalar import (
    BitReader,
    clz32,
    entropy_decode_value,
    entropy_rice_decode,
    format_samples,
    i32,
    predictor_decompress_fir_adapt,
    trunc_div,
)


def bits_to_bytes(s: str) -> bytes:
    s = s.replace(" ", "").replace("_", "")
    s = s + "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


class TestHelpers:
    def test_i32_wrap(self):
        assert i32(0x7FFFFFFF) == 2147483647
        assert i32(0x80000000) == -2147483648
        assert i32(0xFFFFFFFF) == -1
        assert i32(1 << 35) == 0

    def test_trunc_div_toward_zero(self):
        # C# integer division truncates (AlacFile.cs:225,234).
        assert trunc_div(7, 2) == 3
        assert trunc_div(-7, 2) == -3  # floor would give -4
        assert trunc_div(-1, 2) == 0
        assert trunc_div(-84, 64) == -1

    def test_clz32(self):
        # The reference ladder falls through to `output + 8` for zero
        # (AlacFile.cs:190): clz(0) = 40, which makes the zero-run k 16
        # when history is exactly 0.
        assert clz32(0) == 40
        assert clz32(1) == 31
        assert clz32(3) == 30
        assert clz32(0x00012345) == 15
        assert clz32(-1) == 0  # negative inputs: top bit set (AlacFile.cs:154-191)
        assert clz32(0x80000000 - 0x100000000) == 0


class TestBitReader:
    def test_msb_first_reads(self):
        r = BitReader(bytes([0b1011_0011, 0xFF, 0x00, 0xAA]))
        assert r.readbits(3) == 0b101
        assert r.readbit() == 1
        assert r.readbits16(6) == 0b0011_11
        assert r.bitpos == 10

    def test_readbits_32(self):
        r = BitReader(bytes([0x89, 0xAB, 0xCD, 0xEF, 0x12]))
        # C# composes hi<<16|lo with int32 wraparound (AlacFile.cs:125-129).
        assert r.readbits(32) == i32(0x89ABCDEF)
        assert r.bitpos == 32

    def test_unreadbits_across_byte_boundary(self):
        r = BitReader(bytes([0xF0, 0x0F]))
        r.readbits(12)
        assert (r.idx, r.acc) == (1, 4)
        r.unreadbits(7)  # acc 4-7 = -3 -> idx += -1, acc = 5
        assert (r.idx, r.acc) == (0, 5)
        assert r.bitpos == 5

    def test_zero_padding_past_end(self):
        r = BitReader(bytes([0xFF]))
        assert r.readbits16(16) == 0xFF00


class TestEntropyDecode:
    def test_k1_unary(self):
        r = BitReader(bits_to_bytes("110"))
        assert entropy_decode_value(r, 16, 1, -1) == 2

    def test_escape_path(self):
        # 9 ones then a raw 16-bit value (AlacFile.cs:196-202).
        r = BitReader(bits_to_bytes("111111111" + format(700, "016b")))
        assert entropy_decode_value(r, 16, 1, -1) == 700

    def test_k_gt1_with_extra(self):
        # k=3, m=7: value = x*7 + extra-1 for extra>1 (AlacFile.cs:205-211).
        r = BitReader(bits_to_bytes("10" + "101"))  # x=1, extra=5
        assert entropy_decode_value(r, 16, 3, -1) == 7 + 4

    def test_k_gt1_extra_le1_unreads(self):
        # extra<=1 -> value = x*m, 1 bit handed back (AlacFile.cs:209-210).
        r = BitReader(bits_to_bytes("10" + "001"))  # x=1, extra reads 001=0? no:
        # readbits(3) reads "001"=1 <=1 -> unread 1 -> net 2 bits consumed
        assert entropy_decode_value(r, 16, 3, -1) == 7
        assert r.bitpos == 2 + 2

    def test_mask_applies_to_multiplier(self):
        # zero-run path passes (1<<kmod)-1; multiplier becomes min mask
        # (AlacFile.cs:206,236).
        r = BitReader(bits_to_bytes("110" + "0000"))  # x=2, extra=0 -> unread
        assert entropy_decode_value(r, 16, 4, 0b111) == 2 * 7


class TestRiceDecode:
    def test_zero_run_and_sign_modifier(self):
        # Hand-built stream: inithist=10, kmod=14, mult=40.
        # value "110" -> dv=2 -> +1; history 90 -> zero-run block k=2,
        # "0"+"00" (1 unread) -> blockSize 0, sign_modifier=1;
        # then "0" -> raw 0 + modifier = dv 1 -> -1.
        out = [99] * 2
        r = BitReader(bits_to_bytes("110" + "000" + "0"))
        entropy_rice_decode(r, out, 2, 16, 10, 14, 40, (1 << 14) - 1)
        assert out == [1, -1]

    def test_zero_run_fills_zeros(self):
        # value dv=2 -> history 90 -> block: k=2, m=3: "10"+"11": x=1,
        # extra=3 -> blockSize=1*3+2=5 -> five zeros, then "0" -> dv=1 -> -1.
        out = [99] * 8
        r = BitReader(bits_to_bytes("110" + "10" + "11" + "0"))
        entropy_rice_decode(r, out, 7, 16, 10, 14, 40, (1 << 14) - 1)
        assert out[:7] == [1, 0, 0, 0, 0, 0, -1]

    def test_history_escape_clamp(self):
        # dv > 0xFFFF clamps history to 0xFFFF (AlacFile.cs:229).
        big = 0x12345
        r = BitReader(bits_to_bytes("111111111" + format(big, "018b") + "0"))
        out = [0] * 2
        entropy_rice_decode(r, out, 2, 18, 10, 14, 40, (1 << 14) - 1)
        # first value decodes via escape; second "0" gives dv=0 -> 0
        assert out[0] == trunc_div(big + 1, 2) * (-1 if big & 1 else 1)


class TestPredictor:
    def test_order0_passthrough(self):
        buf = [5, -3, 7, 0]
        out = predictor_decompress_fir_adapt(buf, 4, 16, [0] * 32, 0, 9)
        assert out == [5, -3, 7, 0]

    def test_order31_integration(self):
        buf = [100, 5, -10, 3]
        out = predictor_decompress_fir_adapt(buf, 4, 16, [0] * 32, 0x1F, 9)
        assert out == [100, 105, 95, 98]

    def test_order31_sign_extension(self):
        # Overflow past readsamplesize wraps via <<bitsmove>>bitsmove
        # (AlacFile.cs:278-279).
        buf = [32767, 1]
        out = predictor_decompress_fir_adapt(buf, 2, 16, [0] * 32, 0x1F, 9)
        assert out == [32767, -32768]

    def test_order1_adaptive_update(self):
        # Hand-derived: coefs=[512], quant=9, errs=[5,1,3]:
        # out0=5; warmup out1=signext(5+1)=6;
        # i=2: sum=(6-5)*512=512; outval=((256+512)>>9)+5+3=9;
        # adaptive: val=5-6=-1, sign=-1 -> coef 513; ev=3-(1>>9)*1=3.
        coefs = [512] + [0] * 31
        buf = [5, 1, 3]
        out = predictor_decompress_fir_adapt(buf, 3, 16, coefs, 1, 9)
        assert out == [5, 6, 9]
        assert coefs[0] == 513

    def test_order2_negative_error_walk(self):
        # errs=[10, 2, -1, -300]: out0=10, out1=12, out2=11 (warmup),
        # i=3: base=0: sum=(out2-out0)*c0+(out1-out0)*c1 = 1*1024+2*(-512)=0
        # outval=((256+0)>>9)+10-300 = -290; adaptive negative branch:
        # pn=1: val=out0-out1=-2, sign=-(-1)=1, c1=-513, val=-2,
        #   ev=-300-(-2>>9)*(2-1) = -300-(-1) = -299
        # pn=0: val=out0-out2=-1, sign=1, c0=1023, val=-1,
        #   ev=-299-(-1>>9)*2 = -297
        coefs = [1024, -512] + [0] * 30
        buf = [10, 2, -1, -300]
        out = predictor_decompress_fir_adapt(buf, 4, 16, coefs, 2, 9)
        assert out == [10, 12, 11, -290]
        assert coefs[:2] == [1023, -513]


class TestFormatSamples:
    def test_bps2_little_endian(self):
        # samcnt counted in bytes, decremented by 2 (AlacContext.cs:231-241).
        assert format_samples(2, [0x1234, -2], 4) == bytes([0x34, 0x12, 0xFE, 0xFF])

    def test_bps1_offset_binary(self):
        assert format_samples(1, [-128, 0, 127], 3) == bytes([0, 128, 255])

    def test_bps3_passthrough(self):
        assert format_samples(3, [1, 2, 3], 3) == bytes([1, 2, 3])


class TestZeroHistoryQuirk:
    def test_zero_run_k_with_zero_history(self):
        """history == 0 at the zero-run check: the reference ladder gives
        clz(0) = 40 (AlacFile.cs:190), so k = 40 + (16/64) - 24 = 16 — not
        the 8 a plain 32-bit clz would produce. Hand-derived stream with
        inithist=0, mult=40, kmod=14:
          "0"                 -> dv=0, out 0; h stays 0 -> zero-run check
          "0"+16x"...11" (k=16, m=min(2^16-1, kmask)=16383):
                unary x=0, extra=3 -> blockSize = 2 -> two zeros, sm=1
          "0"                 -> raw 0 + sm = dv 1 -> out -1
        A k=8 (clz(0)=32) decoder would read only 8 extra bits and
        desynchronize.
        """
        out = [99] * 4
        r = BitReader(bits_to_bytes("0" + "0" + "0000000000000011" + "0"))
        entropy_rice_decode(r, out, 4, 16, 0, 14, 40, (1 << 14) - 1)
        assert out == [0, 0, 0, -1]
        assert r.bitpos == 1 + 1 + 16 + 1
