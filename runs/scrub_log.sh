#!/bin/bash
# Log scrubber (round 18, VERDICT r17 task #1): every log destined for
# runs/ passes through here BEFORE it can be committed. Two filters:
#   1. sbt fork-failure classpath echoes ("Running java with options
#      -classpath ...") — these dump the resolver cache paths of the
#      build host, which is build-infrastructure detail that has no
#      place in a public repo (round 17's LEAKCHECK hit was exactly
#      such a line).
#   2. A hostname mask for anything that still looks like an internal
#      package-mirror path, as a belt-and-braces second layer.
# Usage: scrub_log.sh <file>   (in-place)  — or as a pipe filter with
# no args. The scrub is idempotent.
scrub() {
  sed -E \
    -e 's#(Running java with options) -classpath [^ ]+#\1 -classpath [redacted: classpath dump scrubbed]#' \
    -e 's#/root/\.cache/coursier/v1/https?/[^/]+#/root/.cache/coursier/v1/[mirror-redacted]#g'
}
if [ $# -ge 1 ]; then
  for f in "$@"; do
    tmp="$(mktemp)" && scrub < "$f" > "$tmp" && mv "$tmp" "$f"
  done
else
  scrub
fi
