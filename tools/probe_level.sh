#!/bin/bash
# Single-level pinned ScalingChild probe (A/B attribution runs only —
# scaling WINDOWS always come from graft.ScalingBench so both levels
# share one invocation). Mirrors ScalingChild.runPinned's exact fork:
# taskset + ActiveProcessorCount + add-opens + tmpfs local dirs.
#
#   tools/probe_level.sh <cpus> <nHosts> <perWave> <nWaves> [extra JVM flags...]
#
# env: SPARK_DRIVER_MEM (default 64g), GRAFT_GC (default ParallelGC),
#      GRAFT_BEST_OF (default 2), GRAFT_EVENTLOG (event log dir)
set -euo pipefail
CPUS=$1; NHOSTS=$2; PERWAVE=$3; NWAVES=$4; shift 4
MEM=${SPARK_DRIVER_MEM:-64g}
GC=${GRAFT_GC:-ParallelGC}
# GRAFT_CLASSES overrides the classes dir (ABAB probes against a
# preserved copy of a parent epoch's target/scala-2.13/classes)
CP="${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}:$(echo /opt/spark/jars/*.jar | tr ' ' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
EVLOG=""
if [ -n "${GRAFT_EVENTLOG:-}" ]; then
  EVLOG="-Dspark.eventLog.enabled=true -Dspark.eventLog.dir=$GRAFT_EVENTLOG"
fi
exec taskset -c 0-$((CPUS-1)) java \
  -XX:ActiveProcessorCount=$CPUS "-XX:+Use$GC" -Xmx$MEM \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  $EVLOG $OPENS "$@" \
  -cp "$CP" graft.ScalingChild $CPUS $NHOSTS $PERWAVE $NWAVES
