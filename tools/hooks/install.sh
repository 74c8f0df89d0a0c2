#!/bin/sh
# Point git at the repo-local hooks directory so tools/hooks/pre-commit runs
# on every commit. Idempotent; run once per clone.
set -e
cd "$(git rev-parse --show-toplevel)"
git config core.hooksPath tools/hooks
chmod +x tools/hooks/pre-commit
echo "hooks installed: core.hooksPath=tools/hooks"
