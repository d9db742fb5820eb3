"""Run the HTTP serving layer over a lake dir — the api-node process
(``src/api/server.ts``) of this engine.

    python scripts/serve.py [sf_dir] [port]

Serves the v2 REST routes + the SSE stream (api/http_server.py) from
one long-lived SparkSession; Ctrl-C stops. A fleet deployment runs N
of these per shared session pool behind any HTTP load balancer.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 7000

    from hyperion_history_api_spark.api.http_server import (
        HyperionAPI,
        make_server,
    )
    from hyperion_history_api_spark.session import get_spark

    spark = get_spark("hyperion-http")
    spark.sparkContext.setLogLevel("ERROR")
    api = HyperionAPI(spark, sf_dir)
    server = make_server(api, port=port)
    host, bound = server.server_address[:2]
    print(f"serving {sf_dir} on http://{host}:{bound}  (Ctrl-C to stop)")
    print("routes:", ", ".join(sorted(api.routes)), "+ /v2/stream (SSE)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
