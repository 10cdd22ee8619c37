"""OBU writer->parser roundtrip tests (layer L4 of SURVEY.md §1)."""

import numpy as np
import pytest

from iamf_tpu.constants import (
    AnimationType,
    ChannelLayout,
    Codec,
    ElementType,
    LayoutType,
    OBUType,
    ParameterType,
    SoundSystem,
)
from iamf_tpu.obu import parser
from iamf_tpu.obu.bitstream import BitReader, write_leb128
from iamf_tpu.tools import builder


def test_leb128_roundtrip():
    for v in [0, 1, 127, 128, 300, 2**20, 2**32 - 1, 2**40]:
        data = write_leb128(v)
        br = BitReader(data)
        assert br.leb128() == v, v


def test_bitreader_msb_first():
    br = BitReader(bytes([0b10110100, 0xFF]))
    assert br.bits(1) == 1
    assert br.bits(2) == 0b01
    assert br.bits(5) == 0b10100
    assert br.u8() == 0xFF


def test_bitreader_align_and_tell():
    br = BitReader(bytes([0xAB, 0xCD, 0xEF]))
    br.bits(3)
    assert br.tell() == 1  # partial byte counts as consumed
    assert br.u8() == 0xCD  # u8 aligns first
    assert br.tell() == 2


def test_sequence_header_roundtrip():
    raw = builder.sequence_header_obu(primary_profile=0, additional_profile=1)
    obu = parser.split_obu(raw)
    assert obu is not None and obu.size == len(raw)
    assert obu.type == OBUType.SEQUENCE_HEADER
    sh = parser.parse_sequence_header(obu)
    assert sh.iamf_code == b"iamf"
    assert sh.primary_profile == 0
    assert sh.additional_profile == 1


def test_codec_config_roundtrip():
    conf = builder.pcm_decoder_conf(16, 48000)
    raw = builder.codec_config_obu(7, b"ipcm", 960, 0, conf)
    obu = parser.split_obu(raw)
    cc = parser.parse_codec_config(obu)
    assert cc.codec_conf_id == 7
    assert cc.codec == Codec.PCM
    assert cc.nb_samples_per_frame == 960
    assert cc.roll_distance == 0
    assert cc.decoder_conf == conf


def test_audio_element_stereo_roundtrip():
    raw = builder.audio_element_obu(
        element_id=1,
        element_type=ElementType.CHANNEL_BASED,
        codec_config_id=7,
        substream_ids=[0],
        layers=[builder.LayerSpec(ChannelLayout.STEREO, 1, 1)],
    )
    obu = parser.split_obu(raw)
    el = parser.parse_audio_element(obu)
    assert el.element_id == 1
    assert el.element_type == ElementType.CHANNEL_BASED
    assert el.substream_ids == (0,)
    assert el.channels_config.nb_layers == 1
    layer = el.channels_config.layers[0]
    assert layer.loudspeaker_layout == ChannelLayout.STEREO
    assert layer.nb_substreams == 1
    assert layer.nb_coupled_substreams == 1


def test_audio_element_scalable_layers_roundtrip():
    # Demix/recon definitions must use mode=0 (timing in the definition).
    demix = builder.ParamDefinition(
        id=998, rate=48000, mode=0, duration=960, constant_segment_interval=960
    )
    recon = builder.ParamDefinition(
        id=997, rate=48000, mode=0, duration=960, constant_segment_interval=960
    )
    raw = builder.audio_element_obu(
        element_id=2,
        element_type=ElementType.CHANNEL_BASED,
        codec_config_id=7,
        substream_ids=list(range(7)),
        layers=[
            builder.LayerSpec(ChannelLayout.STEREO, 1, 1),
            builder.LayerSpec(
                ChannelLayout.L510, 2, 1, recon_gain_flag=True,
                output_gain_flags=0b100000, output_gain_q78=-256,
            ),
            builder.LayerSpec(ChannelLayout.L514, 4, 2, recon_gain_flag=True),
        ],
        demix_param=demix,
        recon_param=recon,
        default_demix_mode=1,
        default_demix_w=2,
    )
    el = parser.parse_audio_element(parser.split_obu(raw))
    assert el.nb_substreams == 7
    assert len(el.parameters) == 2
    dp = [p for p in el.parameters if p.type == ParameterType.DEMIXING][0]
    assert dp.id == 998 and dp.default_mode == 1 and dp.default_w == 2
    assert el.channels_config.nb_layers == 3
    l2 = el.channels_config.layers[1]
    assert l2.recon_gain_flag and l2.output_gain.flags == 0b100000
    assert l2.output_gain.gain_q78 == -256
    assert el.channels_config.layers[2].loudspeaker_layout == ChannelLayout.L514


def test_audio_element_ambisonics_roundtrip():
    raw = builder.audio_element_obu(
        element_id=3,
        element_type=ElementType.SCENE_BASED,
        codec_config_id=7,
        substream_ids=[0, 1, 2, 3],
        ambisonics={
            "mode": 0,
            "output_channel_count": 4,
            "substream_count": 4,
            "mapping": [0, 1, 2, 3],
        },
    )
    el = parser.parse_audio_element(parser.split_obu(raw))
    amb = el.ambisonics_config
    assert amb.mode == 0
    assert amb.output_channel_count == 4
    assert amb.mapping == bytes([0, 1, 2, 3])


def test_mix_presentation_roundtrip():
    raw = builder.mix_presentation_obu(
        mix_presentation_id=42,
        elements=[
            builder.MixElementSpec(
                element_id=1,
                mix_gain_param=builder.ParamDefinition(id=100),
                default_mix_gain_q78=-512,
            )
        ],
        layouts=[
            builder.LayoutSpec(
                sound_system=SoundSystem.A,
                integrated_loudness_q78=-4096,
                digital_peak_q78=-256,
            ),
            builder.LayoutSpec(sound_system=-1),  # binaural
        ],
        default_output_mix_gain_q78=256,
    )
    mp = parser.parse_mix_presentation(parser.split_obu(raw))
    assert mp.mix_presentation_id == 42
    sm = mp.sub_mixes[0]
    assert len(sm.elements) == 1
    assert sm.elements[0].element_id == 1
    assert sm.elements[0].element_mix_gain.default_mix_gain_q78 == -512
    assert sm.output_mix_gain.default_mix_gain_q78 == 256
    assert sm.layouts[0].type == LayoutType.SS_CONVENTION
    assert sm.layouts[0].sound_system == SoundSystem.A
    assert sm.layouts[1].is_binaural
    assert sm.loudness[0].integrated_loudness == -4096
    assert sm.loudness[0].digital_peak == -256


def test_parameter_block_mix_gain():
    from iamf_tpu.obu import objects as o

    raw = builder.parameter_block_obu(
        param_id=100,
        ptype=ParameterType.MIX_GAIN,
        duration=960,
        segments=[
            {"interval": 480, "animation": AnimationType.STEP, "start": -256},
            {
                "interval": 480,
                "animation": AnimationType.LINEAR,
                "start": -256,
                "end": 0,
            },
        ],
    )
    obu = parser.split_obu(raw)
    assert parser.peek_parameter_block_id(obu) == 100
    definition = o.ParameterBase(type=ParameterType.MIX_GAIN, id=100, rate=48000, mode=1)
    pb = parser.parse_parameter_block(obu, definition)
    assert pb.duration == 960 and pb.nb_segments == 2
    s0, s1 = pb.segments
    assert s0.animation_type == AnimationType.STEP and s0.start_q78 == -256
    assert s1.animation_type == AnimationType.LINEAR and s1.end_q78 == 0
    assert s0.segment_interval == 480


def test_parameter_block_demix_and_recon():
    from iamf_tpu.obu import objects as o

    raw = builder.parameter_block_obu(
        param_id=998,
        ptype=ParameterType.DEMIXING,
        duration=960,
        constant_segment_interval=960,
        segments=[{"mode": 4}],
    )
    obu = parser.split_obu(raw)
    definition = o.ParameterBase(type=ParameterType.DEMIXING, id=998, rate=48000, mode=1)
    pb = parser.parse_parameter_block(obu, definition)
    assert pb.segments[0].demixing_mode == 4
    assert pb.segments[0].segment_interval == 960

    raw = builder.parameter_block_obu(
        param_id=997,
        ptype=ParameterType.RECON_GAIN,
        duration=960,
        constant_segment_interval=960,
        segments=[{"entries": [None, (0b1100, [200, 210])]}],
    )
    obu = parser.split_obu(raw)
    definition = o.ParameterBase(
        type=ParameterType.RECON_GAIN, id=997, rate=48000, mode=1
    )
    pb = parser.parse_parameter_block(
        obu, definition, nb_layers=2, recon_gain_present_flags=0b10
    )
    entry = pb.segments[0].entries[1]
    assert entry.flags == 0b1100
    assert entry.gains_q08 == (200, 210)
    assert pb.segments[0].entries[0] is None


def test_audio_frame_implicit_and_explicit():
    f = parser.parse_audio_frame(
        parser.split_obu(builder.audio_frame_obu(3, b"\x01\x02", trim_start=5, trim_end=7))
    )
    assert f.substream_id == 3
    assert bytes(f.data) == b"\x01\x02"
    assert f.trim_start == 5 and f.trim_end == 7

    f = parser.parse_audio_frame(
        parser.split_obu(builder.audio_frame_obu(0, b"\xaa", explicit_id=25))
    )
    assert f.substream_id == 25
    assert bytes(f.data) == b"\xaa"


def test_iter_obus_and_find_header():
    stream = (
        b"garbage!"
        + builder.sequence_header_obu()
        + builder.codec_config_obu(1, b"ipcm", 64, 0, builder.pcm_decoder_conf(16, 48000))
        + builder.temporal_delimiter_obu()
    )
    off = parser.find_sequence_header(stream)
    assert off == 8
    obus = list(parser.iter_obus(stream[off:]))
    assert [x.type for x in obus] == [
        OBUType.SEQUENCE_HEADER,
        OBUType.CODEC_CONFIG,
        OBUType.TEMPORAL_DELIMITER,
    ]
    # partial tail stops iteration
    obus = list(parser.iter_obus(stream[off:-1]))
    assert len(obus) == 2


def test_split_records_native_matches_python():
    """The native one-pass splitter (obu_split.cc) must emit exactly the
    records the Python splitter derives, on real streams and on fuzz."""
    import numpy as np
    import vectors
    from iamf_tpu.constants import ChannelLayout

    streams = [
        vectors.build_pcm_layout_stream(
            ChannelLayout.L512, n_frames=7, frame_size=64, amp=0.4)[0],
        vectors.build_opus_layout_stream(
            ChannelLayout.STEREO, n_frames=5, frame_size=960, amp=0.3)[0],
    ]
    # random truncations + bit flips: both splitters must agree on where
    # to stop and what to emit
    rng = np.random.RandomState(7)
    for base in list(streams):
        for _ in range(8):
            b = bytearray(base)
            b[rng.randint(len(b))] ^= 1 << rng.randint(8)
            streams.append(bytes(b[: rng.randint(2, len(b))]))

    assert parser._native_split_lib() is not None, "native splitter missing"
    for s in streams:
        native = parser.split_records(s)
        saved = parser._SPLIT_LIB[1]
        parser._SPLIT_LIB[1] = None
        try:
            py = parser.split_records(s)
        finally:
            parser._SPLIT_LIB[1] = saved
        assert native.shape == py.shape
        assert np.array_equal(native, py), (
            native[(native != py).any(1)], py[(native != py).any(1)])
