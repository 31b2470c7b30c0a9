"""SMF reader/writer and midi2note semantics tests."""

import numpy as np
import pytest

from nylon_amt_tpu.config import Config
from nylon_amt_tpu.labels.midi2note import TempoCurve, midi2note
from nylon_amt_tpu.midi import smf
from nylon_amt_tpu.midi.smf import MidiEvent, MidiFile, MidiTrack, write_notes


@pytest.fixture
def config():
    return Config()


def _write(tmp_path, events, ticks_per_beat=480, tempo_events=None):
    """Build a two-track midi file from absolute-tick note-track events."""
    tempo_track = MidiTrack(tempo_events or [MidiEvent(0, smf.SET_TEMPO, tempo=500000)])
    path = str(tmp_path / "t.mid")
    MidiFile(ticks_per_beat=ticks_per_beat,
             tracks=[tempo_track, MidiTrack(sorted(events, key=lambda e: e.tick))],
             ).write(path)
    return path


def test_roundtrip_notes(tmp_path, config):
    notes = [
        {"pitch": 60, "onset": 0.5, "offset": 1.0, "velocity": 80},
        {"pitch": 64, "onset": 0.5, "offset": 1.5, "velocity": 90},
        {"pitch": 60, "onset": 2.0, "offset": 2.25, "velocity": 40},
    ]
    path = str(tmp_path / "rt.mid")
    write_notes(path, notes)
    parsed = midi2note(config, path)
    assert len(parsed) == 3
    for ref, got in zip(notes, parsed):
        assert got["pitch"] == ref["pitch"]
        assert got["velocity"] == ref["velocity"]
        assert abs(got["onset"] - ref["onset"]) < 2e-3
        assert abs(got["offset"] - ref["offset"]) < 2e-3
        assert got["reonset"] is False


def test_varlen_encoding():
    from nylon_amt_tpu.midi.smf import _encode_varlen, _read_varlen
    for v in [0, 1, 127, 128, 0x3FFF, 0x4000, 0x0FFFFFFF]:
        data = _encode_varlen(v)
        out, pos = _read_varlen(data, 0)
        assert out == v and pos == len(data)


def test_running_status(tmp_path, config):
    """Hand-craft a track using running status; parser must handle it."""
    import struct
    tpb = 480
    # note_on ch0 60 v80, delta 240 -> (running status) 62 v70,
    # delta 240 -> 60 v0 (off), delta 0 -> 62 v0, EOT
    body = bytes([0x00, 0x90, 60, 80,
                  0x81, 0x70, 62, 70,          # delta 240 varlen = 0x81 0x70
                  0x81, 0x70, 60, 0,
                  0x00, 62, 0,
                  0x00, 0xFF, 0x2F, 0x00])
    tempo_trk = b"\x00\xff\x51\x03\x07\xa1\x20\x00\xff\x2f\x00"  # 500000us
    raw = (b"MThd" + struct.pack(">IHHH", 6, 1, 2, tpb)
           + b"MTrk" + struct.pack(">I", len(tempo_trk)) + tempo_trk
           + b"MTrk" + struct.pack(">I", len(body)) + body)
    path = tmp_path / "rs.mid"
    path.write_bytes(raw)
    notes = midi2note(config, str(path))
    assert [(n["pitch"], n["velocity"]) for n in notes] == [(60, 80), (62, 70)]
    assert abs(notes[0]["onset"] - 0.0) < 1e-9
    assert abs(notes[0]["offset"] - 0.5) < 1e-9  # 480 ticks at 120bpm = 0.5 s


def test_sustain_pedal_extends_note(tmp_path, config):
    """Key released while pedal down -> offset at pedal release (ref :78-112)."""
    events = [
        MidiEvent(0, smf.CONTROL_CHANGE, control=64, value=100),   # pedal on
        MidiEvent(0, smf.NOTE_ON, note=60, velocity=80),
        MidiEvent(480, smf.NOTE_OFF, note=60),                     # key up @0.5s
        MidiEvent(1920, smf.CONTROL_CHANGE, control=64, value=0),  # pedal off @2s
    ]
    path = _write(tmp_path, events)
    notes = midi2note(config, path)
    assert len(notes) == 1
    assert abs(notes[0]["offset"] - 2.0) < 1e-9


def test_reonset_closes_previous(tmp_path, config):
    events = [
        MidiEvent(0, smf.NOTE_ON, note=60, velocity=80),
        MidiEvent(480, smf.NOTE_ON, note=60, velocity=90),   # re-onset @0.5s
        MidiEvent(960, smf.NOTE_OFF, note=60),
    ]
    notes = midi2note(config, _write(tmp_path, events))
    assert len(notes) == 2
    first, second = notes
    assert abs(first["offset"] - 0.5) < 1e-9 and first["reonset"] is False
    assert second["reonset"] is True and abs(second["onset"] - 0.5) < 1e-9


def test_unclosed_note_flushed_at_eof(tmp_path, config):
    events = [
        MidiEvent(0, smf.NOTE_ON, note=72, velocity=50),
        MidiEvent(960, smf.NOTE_ON, note=40, velocity=60),
        MidiEvent(1440, smf.NOTE_OFF, note=40),
    ]
    notes = midi2note(config, _write(tmp_path, events))
    pitches = {n["pitch"]: n for n in notes}
    assert abs(pitches[72]["offset"] - 1.5) < 1e-9  # flushed at last event time


def test_tempo_change(tmp_path, config):
    tempo_events = [
        MidiEvent(0, smf.SET_TEMPO, tempo=500000),   # 120 bpm
        MidiEvent(480, smf.SET_TEMPO, tempo=250000), # 240 bpm from beat 1
    ]
    events = [
        MidiEvent(0, smf.NOTE_ON, note=60, velocity=80),
        MidiEvent(960, smf.NOTE_OFF, note=60),  # 1 beat slow + 1 beat fast
    ]
    notes = midi2note(config, _write(tmp_path, events, tempo_events=tempo_events))
    assert abs(notes[0]["offset"] - 0.75) < 1e-9


def test_tempo_curve_before_first_tempo_is_zero(tmp_path):
    """Reference quirk: running tempo starts at 0 (conv_midi2note.py:40-41)."""
    mf = MidiFile(ticks_per_beat=480, tracks=[MidiTrack([
        MidiEvent(960, smf.SET_TEMPO, tempo=500000),
    ])])
    curve = TempoCurve(mf)
    assert curve.seconds(480) == 0.0
    assert abs(curve.seconds(1440) - 0.5) < 1e-9
