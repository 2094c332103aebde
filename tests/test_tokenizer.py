import json

from deepsearch_tts_tpu.engine.tokenizer import (
    ByteTokenizer,
    ChatTemplate,
    IncrementalDetokenizer,
    parse_tool_calls,
)


def test_byte_tokenizer_roundtrip():
    tk = ByteTokenizer()
    for text in ["hello world", "unicode: héllo → 日本語", "<|im_end|>special",
                 "mix <tool_call>{}</tool_call> done"]:
        assert tk.decode(tk.encode(text)) == text


def test_incremental_detok_multibyte():
    tk = ByteTokenizer()
    text = "héllo → 日本語 end"
    ids = tk.encode(text)
    detok = IncrementalDetokenizer(tk)
    out = "".join(detok.push(i) for i in ids)
    assert out == text  # naive per-token decode would emit U+FFFD replacements


def test_incremental_detok_specials():
    tk = ByteTokenizer()
    ids = tk.encode("a<|im_end|>b")
    detok = IncrementalDetokenizer(tk)
    assert "".join(detok.push(i) for i in ids) == "a<|im_end|>b"


def test_chat_template_tools():
    ct = ChatTemplate()
    tools = [{"type": "function", "function": {"name": "deep_websearch"}}]
    out = ct.render(
        [{"role": "system", "content": "sys"},
         {"role": "user", "content": "q"}],
        tools=tools,
    )
    assert "<tools>" in out and "deep_websearch" in out
    assert out.endswith("<|im_start|>assistant\n")


def test_chat_template_tool_turns():
    ct = ChatTemplate()
    msgs = [
        {"role": "user", "content": "q"},
        {"role": "assistant", "content": "", "tool_calls": [
            {"function": {"name": "f", "arguments": json.dumps({"x": 1})}}]},
        {"role": "tool", "content": "result!"},
    ]
    out = ct.render(msgs)
    assert "<tool_call>" in out and '"x": 1' in out
    assert "<tool_response>" in out and "result!" in out


def test_parse_tool_calls():
    text = ('I will search.\n<tool_call>\n{"name": "deep_websearch", '
            '"arguments": {"search_query": "q", "search_intent": "i"}}\n'
            "</tool_call>")
    content, calls = parse_tool_calls(text)
    assert content == "I will search."
    assert calls[0]["function"]["name"] == "deep_websearch"
    assert json.loads(calls[0]["function"]["arguments"])["search_query"] == "q"


def test_parse_tool_calls_malformed():
    content, calls = parse_tool_calls("<tool_call>not json</tool_call> rest")
    assert calls == [] and "rest" in content
