"""Self-contained Standard MIDI File (SMF) reader/writer.

The reference depends on ``mido`` for parsing (``corpus/conv_midi2note.py:5``)
and ``pretty_midi`` for emission (``model/amt.py:7,347-355``); this framework
ships its own implementation of both directions.
"""

from nylon_amt_tpu.midi.smf import MidiEvent, MidiFile, MidiTrack, write_notes

__all__ = ["MidiEvent", "MidiFile", "MidiTrack", "write_notes"]
