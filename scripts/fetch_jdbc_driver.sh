#!/usr/bin/env bash
# Fetch the org.postgresql JDBC driver jar from Maven Central into
# vendor/jars/, where tests/conftest.py picks it up and enables the live
# JDBC round-trip (tests/test_jdbc.py::test_jdbc_roundtrip_live_postgres)
# whenever the throwaway PostgreSQL from scripts/pg_live_setup.sh is up.
#
# Best-effort: sandboxes without network exit non-zero and the suite keeps
# its documented skip (the embedded-Derby round-trip still covers the
# Spark JDBC source end-to-end).
set -euo pipefail

VERSION=${1:-42.7.4}
DEST="$(dirname "$0")/../vendor/jars"
URL="https://repo1.maven.org/maven2/org/postgresql/postgresql/${VERSION}/postgresql-${VERSION}.jar"

mkdir -p "$DEST"
if [ -f "$DEST/postgresql-${VERSION}.jar" ]; then
    echo "already present: $DEST/postgresql-${VERSION}.jar"
    exit 0
fi
curl -fsSL --connect-timeout 10 -o "$DEST/postgresql-${VERSION}.jar" "$URL"
echo "fetched: $DEST/postgresql-${VERSION}.jar"
