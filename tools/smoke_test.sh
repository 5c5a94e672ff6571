#!/usr/bin/env bash
# Post-deploy smoke test (mirror of the reference's
# .github/workflows/smoke-test-azure.yml:35-77): /health must return 200
# with a "status" field; /api/documents must return 200 with a JSON array;
# optionally verify the CORS origin echo.
set -euo pipefail

BASE_URL="${1:?usage: smoke_test.sh BASE_URL [CORS_ORIGIN]}"
CORS_ORIGIN="${2:-}"

echo "== /health"
health=$(curl -sf -w '\n%{http_code}' "$BASE_URL/health" || true)
code=$(tail -n1 <<<"$health")
body=$(head -n-1 <<<"$health")
[[ "$code" == "200" ]] || { echo "health returned $code"; exit 1; }
grep -q '"status"' <<<"$body" || { echo "health body missing status"; exit 1; }

echo "== /api/documents"
docs=$(curl -sf -w '\n%{http_code}' "$BASE_URL/api/documents")
code=$(tail -n1 <<<"$docs")
body=$(head -n-1 <<<"$docs")
[[ "$code" == "200" ]] || { echo "documents returned $code"; exit 1; }
[[ "$body" == \[* ]] || { echo "documents body is not a JSON array"; exit 1; }

echo "== /metrics"
metrics=$(curl -sf "$BASE_URL/metrics")
grep -q 'omni_searches_total' <<<"$metrics" || { echo "metrics missing counters"; exit 1; }

if [[ -n "$CORS_ORIGIN" ]]; then
  echo "== CORS echo for $CORS_ORIGIN"
  allow=$(curl -sf -D- -o /dev/null -H "Origin: $CORS_ORIGIN" "$BASE_URL/api/documents" \
    | tr -d '\r' | awk -F': ' 'tolower($1)=="access-control-allow-origin" {print $2}')
  [[ "$allow" == "$CORS_ORIGIN" ]] || { echo "CORS echo missing (got '$allow')"; exit 1; }
fi

echo "smoke test passed"
