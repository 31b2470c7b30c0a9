"""MusicXML sheet export tests (``infer/sheet.py``)."""

import xml.etree.ElementTree as ET

from nylon_amt_tpu.infer.sheet import to_musicxml


def _n(pitch, onset, offset, velocity=80):
    return {"pitch": pitch, "onset": onset, "offset": offset,
            "velocity": velocity}


def _parse(xml):
    # Strip the DOCTYPE (ElementTree refuses external DTD references).
    body = xml[xml.index("<score-partwise"):]
    return ET.fromstring(body)


def test_document_structure_and_full_measures():
    notes = [_n(64, 0.0, 0.5), _n(67, 1.0, 1.5), _n(60, 3.5, 4.5)]
    root = _parse(to_musicxml(notes, tempo=120, grid=16))
    assert root.tag == "score-partwise"
    measures = root.findall("./part/measure")
    assert measures
    divisions = int(root.find(".//divisions").text)
    # 4/4 at `divisions` units per quarter: every bar must sum to 4*divisions.
    for m in measures:
        total = sum(int(d.text) for d in m.findall("./note/duration"))
        assert total == 4 * divisions, ET.tostring(m)


def test_pitch_spelling_sharps_and_octaves():
    # C4 = 60, C#4 = 61, A0 = 21 (octave 0)
    xml = to_musicxml([_n(60, 0.0, 0.5), _n(61, 0.5, 1.0), _n(21, 1.0, 1.5)])
    root = _parse(xml)
    pitches = [(p.findtext("step"), p.findtext("alter"), p.findtext("octave"))
               for p in root.iter("pitch")]
    assert ("C", None, "4") in pitches
    assert ("C", "1", "4") in pitches
    assert ("A", None, "0") in pitches


def test_simultaneous_notes_become_chord():
    xml = to_musicxml([_n(60, 0.0, 1.0), _n(64, 0.0, 1.0), _n(67, 0.0, 1.0)])
    root = _parse(xml)
    notes = [n for n in root.iter("note") if n.find("pitch") is not None]
    assert len(notes) == 3
    assert notes[0].find("chord") is None
    assert notes[1].find("chord") is not None
    assert notes[2].find("chord") is not None
    # Chord members share one duration slot: bar still sums to a full 4/4.
    m = root.find("./part/measure")
    divisions = int(root.find(".//divisions").text)
    pitched_or_rest = m.findall("./note")
    total = sum(int(n.findtext("duration")) for n in pitched_or_rest
                if n.find("chord") is None)
    assert total == 4 * divisions


def test_gaps_become_rests():
    xml = to_musicxml([_n(60, 0.0, 0.25), _n(62, 2.0, 2.25)], tempo=120)
    root = _parse(xml)
    assert any(n.find("rest") is not None for n in root.iter("note"))


def test_empty_input_yields_one_rest_bar():
    root = _parse(to_musicxml([]))
    measures = root.findall("./part/measure")
    assert len(measures) == 1
    notes = measures[0].findall("note")
    assert len(notes) == 1 and notes[0].find("rest") is not None


def test_title_is_escaped():
    xml = to_musicxml([_n(60, 0.0, 1.0)], title='a <b> & "c"')
    assert "<work-title>a &lt;b&gt; &amp; \"c\"</work-title>" in xml
    _parse(xml)  # still well-formed


def test_note_truncated_at_next_onset_and_barline():
    # A long note at slot 0 must not overlap the next occupied slot.
    xml = to_musicxml([_n(60, 0.0, 10.0), _n(62, 1.0, 1.25)], tempo=120)
    root = _parse(xml)
    first = next(n for n in root.iter("note") if n.find("pitch") is not None)
    divisions = int(root.find(".//divisions").text)
    # 1.0 s at 120 bpm = 2 beats = 2*divisions units max
    assert int(first.findtext("duration")) <= 2 * divisions
