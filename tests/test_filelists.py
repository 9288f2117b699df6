"""File-list store tests (train_files.txt / target_files.txt formats)."""

from streamz_tpu.io import filelists as fl


def test_train_files_roundtrip(tmp_path):
    p = tmp_path / "train_files.txt"
    entries = [("a.mp3", 0), ("b.wav", None), ("c.mp3", 7)]
    fl.write_train_files(str(p), entries)
    assert p.read_text() == "a.mp3,0\nb.wav\nc.mp3,7\n"
    assert fl.load_train_files(str(p)) == entries


def test_train_files_tolerates_bad_lines(tmp_path):
    p = tmp_path / "train_files.txt"
    p.write_text("a.mp3, 3\n\n , \nb.wav,notanint\nc.wav\n")
    got = fl.load_train_files(str(p))
    # bad label -> unlabeled entry (reference parses label leniently,
    # src/main.rs:51-57); empty paths skipped.
    assert got == [("a.mp3", 3), ("b.wav", None), ("c.wav", None)]


def test_target_files_only_labeled(tmp_path):
    p = tmp_path / "target_files.txt"
    fl.write_target_files(str(p), [("a.wav", 1), ("b.wav", None), ("c.wav", 0)])
    assert fl.load_target_files(str(p)) == [("a.wav", 1), ("c.wav", 0)]


def test_missing_files_empty(tmp_path):
    assert fl.load_train_files(str(tmp_path / "nope.txt")) == []
    assert fl.load_target_files(str(tmp_path / "nope.txt")) == []


def test_count_speakers():
    assert fl.count_speakers([("a", 0), ("b", 2), ("c", 0), ("d", None)]) == 2
    assert fl.count_speakers([]) == 0


def test_label_map_normalization():
    train = [("a", 5), ("b", None), ("c", 9)]
    ev = [("d", 5), ("e", 2)]
    m = fl.build_label_map(train, ev)
    # sorted raw labels {2,5,9} -> 0,1,2
    assert m == {2: 0, 5: 1, 9: 2}
    assert fl.normalize_with_map(ev, m) == [("d", 1), ("e", 0)]
