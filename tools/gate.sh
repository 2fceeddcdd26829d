#!/bin/sh
# Pre-snapshot / pre-commit gate: the tree must COMPILE (main + test)
# before any snapshot is taken. Round 4 shipped a snapshot where
# Dedup.scala referenced a deleted function -- the driver's bench and
# correctness runs both died at `sbt compile`, zeroing the round's
# entire signal. This gate is the one-line insurance against that class
# of loss; it deliberately runs only Test/compile (fast, ~10 s warm),
# not the full suite -- correctness belongs to tools/check.py.
set -e
cd "$(dirname "$0")/.."
exec sbt -batch Test/compile
