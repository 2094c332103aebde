import base64
import json

from deepsearch_tts_tpu.datasets import extract_question, load_dataset, xor_decrypt
from deepsearch_tts_tpu.datasets.loaders import decrypt_canary_field, load_records


def test_xor_roundtrip():
    msg, key = "secret question?", "canary-key"
    enc = xor_decrypt(msg.encode(), key)
    assert xor_decrypt(enc, key).decode() == msg
    b64 = base64.b64encode(enc).decode()
    assert decrypt_canary_field(b64, key) == msg


def test_question_key_aliases():
    assert extract_question({"Question": "q"}) == "q"
    assert extract_question({"problem": "p"}) == "p"
    assert extract_question({"prompt": "pr"}) == "pr"
    assert extract_question({"question": "lc"}) == "lc"
    assert extract_question({}) == ""


def test_load_json_list(tmp_path):
    path = tmp_path / "d.json"
    json.dump([{"problem": "what?", "answer": "that"}], open(path, "w"))
    recs = load_dataset(str(path))
    assert recs[0]["Question"] == "what?"


def test_load_csv_canary(tmp_path):
    key = "k123"
    q = base64.b64encode(xor_decrypt("Q?".encode(), key)).decode()
    a = base64.b64encode(xor_decrypt("A!".encode(), key)).decode()
    path = tmp_path / "d.csv"
    path.write_text(f"canary,prompt,answer\n{key},{q},{a}\n")
    recs = load_records(str(path))
    assert recs[0]["prompt"] == "Q?" and recs[0]["answer"] == "A!"
    assert recs[0]["Question"] == "Q?"


def test_limit(tmp_path):
    path = tmp_path / "d.json"
    json.dump([{"Question": str(i)} for i in range(10)], open(path, "w"))
    assert len(load_dataset(str(path), limit=3)) == 3
