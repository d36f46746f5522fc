#!/usr/bin/env bash
# Tracked-content hygiene gate: greps every git-TRACKED file for known
# sandbox-internal patterns (infrastructure hostnames, resolver URLs)
# that must never enter the committed tree. The per-round external leak
# scan also walks git history and its own prior reports, so a single
# stray mention cascades into an ever-growing echo chain of quoted
# hits; this check pins the invariant that matters — the tree itself is
# clean — at commit time, repo-side.
#
# The patterns are built from FRAGMENTS (character classes break up the
# literal) so this script never contains the strings it hunts and can
# never flag itself.
set -euo pipefail
cd "$(dirname "$0")/.."

# internal resolver / infra hostname shapes seen in the sandbox config
PATTERNS=(
  '[a]rtifactory\.[a-z]+\.[a]nt\.[a-z]+'
  '[i]nfra\.[a]nt\.[d]ev'
  '[a]nthropic-internal'
)

fail=0
for pat in "${PATTERNS[@]}"; do
  # NUL-safe over the tracked set; judge/driver round artifacts quote
  # prior reports verbatim and are not builder-authored content
  hits=$(git ls-files -z \
    | grep -zvE '^(VERDICT\.md|ADVICE\.md|PROGRESS\.jsonl|LEAKCHECK\.json|COPYCHECK\.json)$' \
    | xargs -0 grep -lE "$pat" 2>/dev/null || true)
  if [[ -n "$hits" ]]; then
    echo "LEAK pattern '$pat' in tracked files:"
    echo "$hits"
    fail=1
  fi
done

if [[ "$fail" -ne 0 ]]; then
  echo "FAIL: internal patterns present in tracked content"; exit 1
fi
echo "leakcheck: 0 hits across $(git ls-files | wc -l) tracked files"
