/* Dashboard chart glue (parity: reference dashboard/static/js/dashboard.js,
   rebuilt as dependency-free inline-SVG renderers). */
"use strict";

const api = (p) => fetch(p).then((r) => r.json());

function svgEl(tag, attrs) {
  const el = document.createElementNS("http://www.w3.org/2000/svg", tag);
  for (const [k, v] of Object.entries(attrs)) el.setAttribute(k, v);
  return el;
}

function barChart(container, labels, values, opts = {}) {
  container.innerHTML = "";
  if (!labels.length) { container.textContent = "no data"; return; }
  const W = 560, H = 240, pad = 40;
  const svg = svgEl("svg", { width: W, height: H });
  const maxV = Math.max(...values, opts.yMax || 0) || 1;
  const bw = (W - 2 * pad) / labels.length;
  values.forEach((v, i) => {
    const h = (H - 2 * pad) * (v / maxV);
    svg.appendChild(svgEl("rect", {
      x: pad + i * bw + 4, y: H - pad - h, width: bw - 8, height: h,
      class: "bar",
    }));
    const t = svgEl("text", {
      x: pad + i * bw + bw / 2, y: H - pad + 14, "text-anchor": "middle",
      class: "tick",
    });
    t.textContent = labels[i].slice(0, 14);
    svg.appendChild(t);
    const vt = svgEl("text", {
      x: pad + i * bw + bw / 2, y: H - pad - h - 4, "text-anchor": "middle",
      class: "val",
    });
    vt.textContent = typeof v === "number" ? v.toFixed(2) : v;
    svg.appendChild(vt);
  });
  svg.appendChild(svgEl("line", {
    x1: pad, y1: H - pad, x2: W - pad, y2: H - pad, class: "axis",
  }));
  container.appendChild(svg);
}

function lineChart(container, xs, series, opts = {}) {
  container.innerHTML = "";
  if (!xs.length) { container.textContent = "no data"; return; }
  const W = 560, H = 240, pad = 40;
  const svg = svgEl("svg", { width: W, height: H });
  const all = series.flatMap((s) => s.y);
  const maxV = Math.max(...all) || 1;
  const minV = Math.min(...all, 0);
  const sx = (i) => pad + (W - 2 * pad) * (i / Math.max(1, xs.length - 1));
  const sy = (v) => H - pad - (H - 2 * pad) * ((v - minV) / (maxV - minV || 1));
  series.forEach((s, si) => {
    const d = s.y.map((v, i) => `${i ? "L" : "M"}${sx(i)},${sy(v)}`).join(" ");
    svg.appendChild(svgEl("path", {
      d, fill: "none", class: `line line-${si}`,
      "stroke-dasharray": s.dash ? "6 4" : "none",
    }));
    const lbl = svgEl("text", { x: W - pad, y: 16 + 14 * si,
      "text-anchor": "end", class: `legend line-${si}` });
    lbl.textContent = s.name;
    svg.appendChild(lbl);
  });
  svg.appendChild(svgEl("line", {
    x1: pad, y1: H - pad, x2: W - pad, y2: H - pad, class: "axis",
  }));
  container.appendChild(svg);
}

function groupBy(rows, key) {
  const m = new Map();
  rows.forEach((r) => {
    const k = r[key] ?? "?";
    if (!m.has(k)) m.set(k, []);
    m.get(k).push(r);
  });
  return m;
}

async function loadModel(name) {
  const data = await api(`/api/profile/${name}`);
  const rows = data.results || [];

  const summary = document.getElementById("summary-body");
  summary.innerHTML = `<b>${name}</b>: ${rows.length} entries`;

  const byVariant = groupBy(rows.filter((r) => r.mean_ms), "variant");
  barChart(document.getElementById("chart-latency"),
    [...byVariant.keys()],
    [...byVariant.values()].map((v) =>
      v.reduce((a, r) => a + r.mean_ms, 0) / v.length));

  const tps = rows.filter((r) => r.tokens_per_sec);
  barChart(document.getElementById("chart-throughput"),
    tps.map((r) => r.variant || r.runner || "run"),
    tps.map((r) => r.tokens_per_sec));

  const sp = rows.filter((r) => r.speedup);
  barChart(document.getElementById("chart-speedup"),
    sp.map((r) => `${r.variant} b${r.batch}s${r.seq_len}`),
    sp.map((r) => r.speedup), { yMax: 1 });

  const recs = await api(`/api/recommendations/${name}`);
  const ul = document.getElementById("recs");
  ul.innerHTML = "";
  recs.forEach((r) => {
    const li = document.createElement("li");
    li.innerHTML = `<b>[P${r.priority}] ${r.title}</b> — ${r.estimated_gain}
      <code>${r.action}</code>`;
    ul.appendChild(li);
  });
}

async function init() {
  const models = await api("/api/models");
  const sel = document.getElementById("model-select");
  sel.innerHTML = "";
  models.forEach((m) => {
    const o = document.createElement("option");
    o.value = o.textContent = m;
    sel.appendChild(o);
  });
  sel.onchange = () => loadModel(sel.value);
  if (models.length) loadModel(models[0]);
  if (models.length > 1) {
    const cmp = await api(`/api/compare?ids=${models.join(",")}`);
    document.getElementById("compare-body").innerHTML =
      `<pre>${JSON.stringify(cmp, null, 2)}</pre>`;
  }
}

document.getElementById("refresh").onclick = init;
init();
