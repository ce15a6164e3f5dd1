"""Analysis web service: POST photometry -> posterior summary.

Counterpart of the reference's tornado service (``api/app.py:49-369``,
``run_nmma_model`` with an ALLOWED_MODELS whitelist) on the stdlib HTTP
server (no tornado dependency). Payload:

    {"model": "Me2017", "prior": "<.prior text>",
     "photometry": {filt: {"time": [...], "mag": [...],
                           "mag_error": [...]}},
     "trigger_time": <mjd>, "nlive": 128, ...}

Response: log-evidence, best-fit parameters, posterior quantiles.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

ALLOWED_MODELS = ("Me2017", "HoNa2020", "Piro2021", "TrPi2018",
                  "blackbody_fixedT", "PL_BB_fixedT", "synchrotron_powerlaw")


def run_nmma_model(payload: dict) -> dict:
    model_name = payload.get("model", "Me2017")
    if model_name not in ALLOWED_MODELS:
        raise ValueError(f"model {model_name!r} not in {ALLOWED_MODELS}")

    from ..analysis import EMAnalysis, EMAnalysisConfig
    from ..inference import NestedSamplerConfig
    from ..priors import parse_prior_dict

    data = {f: {k: np.asarray(v, dtype=float) for k, v in sub.items()}
            for f, sub in payload["photometry"].items()}
    priors = parse_prior_dict(payload["prior"])
    cfg = EMAnalysisConfig(
        model=model_name,
        trigger_time=float(payload.get("trigger_time", 0.0)),
        data_tmax=float(payload.get("data_tmax", np.inf)),
        tmin=float(payload.get("tmin", 0.01)),
        tmax=float(payload.get("tmax", 14.0)),
        error_budget=float(payload.get("error_budget", 1.0)),
        outdir=payload.get("outdir", "outdir_api"),
        label=payload.get("label", "api"),
        sampler=NestedSamplerConfig(
            nlive=int(payload.get("nlive", 256)),
            n_delete=max(int(payload.get("nlive", 256)) // 8, 1),
            walks=int(payload.get("walks", 16)),
            dlogz=float(payload.get("dlogz", 0.5)),
            max_iter=int(payload.get("max_iter", 2000))),
    )
    analysis = EMAnalysis(cfg, data=data, priors=priors)
    result = analysis.run(verbose=False, checkpoint=False)
    post = analysis.posterior_samples(result)
    quantiles = {
        k: dict(zip(("p5", "p50", "p95"),
                    np.percentile(v, [5, 50, 95]).tolist()))
        for k, v in post.items() if np.ndim(v) == 1 and k != "log_likelihood"
    }
    response = {
        "status": "success",
        "message": f"Good results with log evidence={result.logz:.2f}",
        "log_evidence": result.logz,
        "log_evidence_err": result.logz_err,
        "n_likelihood_evaluations": result.ncall,
        "bestfit": analysis.bestfit_parameters(result),
        "posterior_quantiles": quantiles,
    }
    # full-depth 'analysis' block mirroring the reference service's
    # response shape (nmma/api/app.py:256-266: arviz-InferenceData
    # netcdf + png plots + joblib results, all base64). arviz/netcdf/
    # joblib are not dependencies here, so the posterior container is a
    # base64 npz holding the complete per-parameter draw arrays — the
    # same information an InferenceData posterior group carries — and
    # the results blob is base64 json.
    import base64
    import io

    buf = io.BytesIO()
    np.savez(buf, **{k: np.asarray(v) for k, v in post.items()
                     if np.ndim(v) == 1})
    analysis_results = {
        "inference_data": {
            "format": "npz",
            "data": base64.b64encode(buf.getvalue()).decode("ascii")},
        "results": {
            "format": "json",
            "data": base64.b64encode(json.dumps({
                "log_evidence": result.logz,
                "log_evidence_err": result.logz_err,
                "ncall": result.ncall,
                "bestfit": response["bestfit"],
                "quantiles": quantiles}).encode()).decode("ascii")},
        "plots": [],
    }
    if payload.get("return_plots"):
        import os

        from ..plotting import corner_plot, lightcurve_fit_plot
        os.makedirs(cfg.outdir, exist_ok=True)
        lc_path = lightcurve_fit_plot(analysis)
        corner_path = os.path.join(cfg.outdir, f"{cfg.label}_corner.png")
        corner_plot(post, save_path=corner_path)
        plots = {}
        for name, path in (("lightcurves", lc_path), ("corner", corner_path)):
            with open(path, "rb") as fh:
                b64 = base64.b64encode(fh.read()).decode("ascii")
            plots[name] = b64
            analysis_results["plots"].append(
                {"format": "png", "name": name, "data": b64})
        response["plots"] = plots
    response["analysis"] = analysis_results
    # reference webhook semantics (upload_analysis_results): POST the
    # response to the payload's callback URL when one is given
    if payload.get("callback_url") and \
            payload.get("callback_method", "POST").upper() == "POST":
        response.update(post_webhook(payload["callback_url"], response))
    return response


def post_webhook(url: str, response: dict, timeout=30):
    """POST the analysis result to a callback URL (reference webhook
    semantics, nmma/api/app.py). stdlib urllib; errors returned, not
    raised, so the analysis result is never lost to a dead callback."""
    import urllib.request
    body = json.dumps(response).encode()
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return {"webhook_status": resp.status}
    except Exception as exc:  # noqa: BLE001
        return {"webhook_status": "error", "webhook_error": str(exc)}


class _Handler(BaseHTTPRequestHandler):
    def do_POST(self):
        if self.path.rstrip("/") not in ("", "/analysis", "/analyze"):
            self.send_error(404)
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length))
            # run_nmma_model posts the webhook itself (once) when the
            # payload carries a callback_url — the handler must not
            # post again (the reference fires the callback exactly once)
            response = run_nmma_model(payload)
            body = json.dumps(response).encode()
            self.send_response(200)
        except Exception as exc:  # noqa: BLE001 — surface errors to client
            body = json.dumps({"status": "error",
                               "message": str(exc)}).encode()
            self.send_response(400)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # quiet
        pass


class AnalysisService:
    """Embeddable threaded HTTP service."""

    def __init__(self, host="127.0.0.1", port=4000):
        self.server = ThreadingHTTPServer((host, port), _Handler)
        self.port = self.server.server_address[1]
        self._thread = None

    def start(self):
        self._thread = threading.Thread(target=self.server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self.server.shutdown()
        self.server.server_close()


def main():
    import argparse
    parser = argparse.ArgumentParser("nmma-tpu analysis service")
    parser.add_argument("--port", type=int, default=4000)
    args = parser.parse_args()
    print(f"serving on :{args.port}")
    AnalysisService(port=args.port).start().server.serve_forever()


if __name__ == "__main__":
    main()
