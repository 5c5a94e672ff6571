"""OpenAPI document for the REST surface (Swagger parity, Program.cs:74-75)."""

from __future__ import annotations


def build_openapi_document() -> dict:
    def ref(name: str) -> dict:
        return {"$ref": f"#/components/schemas/{name}"}

    citation = {
        "type": "object",
        "properties": {
            "documentId": {"type": "string"},
            "fileName": {"type": "string"},
            "chunkId": {"type": "string"},
            "chunkIndex": {"type": "integer"},
            "snippet": {"type": "string"},
            "score": {"type": "number", "format": "double"},
            "createdAtUtc": {"type": "string", "format": "date-time"},
        },
    }
    return {
        "openapi": "3.0.1",
        "info": {"title": "Omni Recall TPU API", "version": "v1"},
        "paths": {
            "/api/documents/upload": {"post": {"tags": ["Documents"], "responses": {"201": {"description": "Created"}, "400": {"description": "Bad Request"}, "413": {"description": "Payload Too Large"}, "415": {"description": "Unsupported Media Type"}}}},
            "/api/documents": {"get": {"tags": ["Documents"], "responses": {"200": {"description": "OK"}}}},
            "/api/documents/{documentId}": {
                "get": {"tags": ["Documents"], "responses": {"200": {"description": "OK"}, "404": {"description": "Not Found"}}},
                "delete": {"tags": ["Documents"], "responses": {"204": {"description": "No Content"}, "404": {"description": "Not Found"}}},
            },
            "/api/documents/{documentId}/chunks": {"get": {"tags": ["Documents"], "responses": {"200": {"description": "OK"}, "404": {"description": "Not Found"}}}},
            "/api/documents/{documentId}/reindex": {"post": {"tags": ["Documents"], "responses": {"200": {"description": "OK"}, "404": {"description": "Not Found"}}}},
            "/api/recall/search": {"post": {"tags": ["Recall"], "responses": {"200": {"description": "OK"}, "400": {"description": "Bad Request"}}}},
            "/api/chat": {"post": {"tags": ["Chat"], "responses": {"200": {"description": "OK"}, "400": {"description": "Bad Request"}, "503": {"description": "Service Unavailable"}}}},
            "/health": {"get": {"tags": ["Health"], "responses": {"200": {"description": "OK"}, "503": {"description": "Service Unavailable"}}}},
        },
        "components": {
            "schemas": {
                "RecallCitationDto": citation,
                "RecallSearchRequestDto": {
                    "type": "object",
                    "properties": {"query": {"type": "string"}, "topK": {"type": "integer", "default": 5}},
                },
                "RecallSearchResponseDto": {
                    "type": "object",
                    "properties": {"query": {"type": "string"}, "citations": {"type": "array", "items": ref("RecallCitationDto")}},
                },
                "ChatRequestDto": {
                    "type": "object",
                    "properties": {"prompt": {"type": "string"}, "topK": {"type": "integer", "default": 5}},
                },
                "ChatResponseDto": {
                    "type": "object",
                    "properties": {
                        "answer": {"type": "string"},
                        "provider": {"type": "string"},
                        "model": {"type": "string"},
                        "citations": {"type": "array", "items": ref("RecallCitationDto")},
                    },
                },
            }
        },
    }
