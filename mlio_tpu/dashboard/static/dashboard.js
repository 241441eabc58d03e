/* Dashboard client (parity: reference dashboard/static/js/dashboard.js,
   rebuilt as dependency-free inline-SVG renderers).

   Renders EVERY chart-spec kind the server-side builders emit
   (mlio_tpu/dashboard/visualizations.py): line, bar, grouped_bar, table —
   with axis labels/ticks, hover tooltips, a sortable op-explorer table,
   and cross-result comparison views. */
"use strict";

const api = (p) => fetch(p).then((r) => r.json());

/* Escape data-derived strings before any innerHTML interpolation: result
   files are user-supplied JSON, so names/annotations must render as text,
   never as markup. */
const esc = (s) => String(s).replace(/[&<>"']/g, (c) =>
  ({ "&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;", "'": "&#39;" }[c]));

function svgEl(tag, attrs) {
  const el = document.createElementNS("http://www.w3.org/2000/svg", tag);
  for (const [k, v] of Object.entries(attrs)) el.setAttribute(k, v);
  return el;
}

function tooltip() {
  let tip = document.getElementById("tooltip");
  if (!tip) {
    tip = document.createElement("div");
    tip.id = "tooltip";
    document.body.appendChild(tip);
  }
  return tip;
}

function showTip(evt, html) {
  const tip = tooltip();
  tip.innerHTML = html;
  tip.style.display = "block";
  tip.style.left = `${evt.pageX + 12}px`;
  tip.style.top = `${evt.pageY - 10}px`;
}

function hideTip() {
  const tip = tooltip();
  tip.style.display = "none";
}

const fmt = (v) =>
  typeof v !== "number" ? String(v)
    : Math.abs(v) >= 1000 ? v.toLocaleString("en-US", { maximumFractionDigits: 0 })
    : Math.abs(v) >= 1 ? v.toFixed(2)
    : v.toPrecision(3);

function axes(svg, W, H, pad, xLabel, yLabel, minV, maxV) {
  svg.appendChild(svgEl("line", { x1: pad, y1: H - pad, x2: W - pad, y2: H - pad, class: "axis" }));
  svg.appendChild(svgEl("line", { x1: pad, y1: pad, x2: pad, y2: H - pad, class: "axis" }));
  for (let i = 0; i <= 4; i++) {
    const v = minV + ((maxV - minV) * i) / 4;
    const y = H - pad - ((H - 2 * pad) * i) / 4;
    const t = svgEl("text", { x: pad - 4, y: y + 3, "text-anchor": "end", class: "tick" });
    t.textContent = fmt(v);
    svg.appendChild(t);
    svg.appendChild(svgEl("line", { x1: pad, y1: y, x2: W - pad, y2: y, class: "grid" }));
  }
  if (xLabel) {
    const t = svgEl("text", { x: W / 2, y: H - 4, "text-anchor": "middle", class: "tick" });
    t.textContent = xLabel;
    svg.appendChild(t);
  }
  if (yLabel) {
    const t = svgEl("text", {
      x: 10, y: H / 2, class: "tick", transform: `rotate(-90 10 ${H / 2})`,
      "text-anchor": "middle",
    });
    t.textContent = yLabel;
    svg.appendChild(t);
  }
}

function barChart(container, spec) {
  const labels = spec.labels || [], values = spec.values || [];
  if (!labels.length) { container.textContent = "no data"; return; }
  const W = 560, H = 260, pad = 46;
  const svg = svgEl("svg", { width: W, height: H });
  const maxV = Math.max(...values, spec.y_max || 0, spec.baseline || 0) || 1;
  axes(svg, W, H, pad, "", spec.y_label || "", 0, maxV);
  const bw = (W - 2 * pad) / labels.length;
  values.forEach((v, i) => {
    const h = (H - 2 * pad) * (v / maxV);
    const rect = svgEl("rect", {
      x: pad + i * bw + 3, y: H - pad - h, width: Math.max(1, bw - 6),
      height: Math.max(0, h), class: "bar",
    });
    const note = (spec.annotations || [])[i];
    rect.onmousemove = (e) =>
      showTip(e, `<b>${esc(labels[i])}</b>: ${fmt(v)}${note ? `<br>${esc(note)}` : ""}`);
    rect.onmouseleave = hideTip;
    svg.appendChild(rect);
    const t = svgEl("text", {
      x: pad + i * bw + bw / 2, y: H - pad + 12, "text-anchor": "middle", class: "tick",
    });
    t.textContent = String(labels[i]).slice(0, Math.max(4, Math.floor(bw / 6)));
    svg.appendChild(t);
  });
  if (spec.baseline) {
    const y = H - pad - (H - 2 * pad) * (spec.baseline / maxV);
    svg.appendChild(svgEl("line", { x1: pad, y1: y, x2: W - pad, y2: y, class: "baseline" }));
  }
  container.appendChild(svg);
}

function lineChart(container, spec) {
  const xs = spec.x || [], series = spec.series || [];
  if (!xs.length || !series.length) { container.textContent = "no data"; return; }
  const W = 560, H = 260, pad = 46;
  const svg = svgEl("svg", { width: W, height: H });
  // Interactive state: x-range zoom [lo, hi) (wheel to zoom at cursor,
  // drag to pan, dblclick to reset), per-series visibility (legend click),
  // and a crosshair synced ACROSS every line chart on the page.
  const st = { lo: 0, hi: xs.length, hidden: new Set() };

  function render() {
    svg.innerHTML = "";
    const lo = st.lo, hi = Math.max(st.lo + 2, st.hi);
    const vis = series.filter((_, si) => !st.hidden.has(si));
    const all = vis.flatMap((s) => s.y.slice(lo, hi));
    const maxV = Math.max(...all) || 1;
    const minV = Math.min(...all, 0);
    axes(svg, W, H, pad, spec.x_label || "", spec.y_label || "", minV, maxV);
    const n = hi - lo;
    const sx = (i) => pad + (W - 2 * pad) * ((i - lo) / Math.max(1, n - 1));
    const sy = (v) => H - pad - (H - 2 * pad) * ((v - minV) / (maxV - minV || 1));
    series.forEach((s, si) => {
      if (st.hidden.has(si)) return;
      const seg = s.y.slice(lo, hi);
      const d = seg.map((v, i) => `${i ? "L" : "M"}${sx(lo + i)},${sy(v)}`).join(" ");
      svg.appendChild(svgEl("path", {
        d, fill: "none", class: `line line-${si % 6}`,
        "stroke-dasharray": s.dash ? "6 4" : "none",
      }));
      if (n <= 200) seg.forEach((v, i) => {
        const c = svgEl("circle", { cx: sx(lo + i), cy: sy(v), r: 3, class: `dot line-${si % 6}` });
        c.onmousemove = (e) => showTip(e, `<b>${esc(s.name)}</b><br>${esc(spec.x_label || "x")}=${esc(xs[lo + i])}, y=${fmt(v)}`);
        c.onmouseleave = hideTip;
        svg.appendChild(c);
      });
    });
    series.forEach((s, si) => {
      const lbl = svgEl("text", {
        x: W - pad, y: 16 + 13 * si, "text-anchor": "end",
        class: `legend line-${si % 6}`, style: "cursor:pointer",
        opacity: st.hidden.has(si) ? 0.3 : 1,
      });
      lbl.textContent = s.name;
      lbl.onclick = () => {   // legend toggle
        st.hidden.has(si) ? st.hidden.delete(si) : st.hidden.add(si);
        render();
      };
      svg.appendChild(lbl);
    });
  }
  render();

  // crosshair synced across all line charts (cross-chart linking)
  const cross = svgEl("line", { y1: pad, y2: H - pad, class: "axis",
                                "stroke-dasharray": "3 3", opacity: 0 });
  svg.appendChild(cross);
  const setCross = (frac) => {
    if (frac == null) { cross.setAttribute("opacity", 0); return; }
    cross.setAttribute("opacity", 0.6);
    const x = pad + (W - 2 * pad) * frac;
    cross.setAttribute("x1", x);
    cross.setAttribute("x2", x);
    svg.appendChild(cross);  // keep on top after re-renders
  };
  (window._lineCharts = window._lineCharts || []).push(setCross);
  svg.addEventListener("mousemove", (e) => {
    const frac = Math.min(1, Math.max(0,
      (e.offsetX - pad) / (W - 2 * pad)));
    window._lineCharts.forEach((f) => f(frac));
  });
  svg.addEventListener("mouseleave", () =>
    window._lineCharts.forEach((f) => f(null)));

  // wheel zoom at the cursor + drag pan + dblclick reset
  svg.addEventListener("wheel", (e) => {
    e.preventDefault();
    const span = st.hi - st.lo;
    if (span <= 4 && e.deltaY < 0) return;
    const frac = Math.min(1, Math.max(0, (e.offsetX - pad) / (W - 2 * pad)));
    const center = st.lo + frac * span;
    const ns = Math.min(xs.length, Math.max(4,
      Math.round(span * (e.deltaY < 0 ? 0.8 : 1.25))));
    st.lo = Math.max(0, Math.round(center - frac * ns));
    st.hi = Math.min(xs.length, st.lo + ns);
    st.lo = Math.max(0, st.hi - ns);
    render();
  }, { passive: false });
  let dragX = null;
  svg.addEventListener("mousedown", (e) => { dragX = e.offsetX; });
  svg.addEventListener("mouseup", () => { dragX = null; });
  svg.addEventListener("mousemove", (e) => {
    if (dragX == null || e.buttons !== 1) return;
    const span = st.hi - st.lo;
    const shift = Math.round((dragX - e.offsetX) / (W - 2 * pad) * span);
    if (!shift) return;
    dragX = e.offsetX;
    st.lo = Math.min(Math.max(0, st.lo + shift), xs.length - span);
    st.hi = st.lo + span;
    render();
  });
  svg.addEventListener("dblclick", () => {
    st.lo = 0; st.hi = xs.length; render();
  });
  container.appendChild(svg);
}

function groupedBarChart(container, spec) {
  const groups = spec.groups || [], metrics = spec.metrics || [], values = spec.values || [];
  if (!groups.length) { container.textContent = "no data"; return; }
  const W = 560, H = 260, pad = 46;
  const svg = svgEl("svg", { width: W, height: H });
  const stacked = !!spec.stacked;
  const maxV = (stacked
    ? Math.max(...values.map((r) => r.reduce((a, b) => a + b, 0)), 0)
    : Math.max(...values.flat(), 0)) || 1;
  axes(svg, W, H, pad, "", spec.y_label || "", 0, maxV);
  const gw = (W - 2 * pad) / groups.length;
  const bw = (gw - 8) / Math.max(1, stacked ? 1 : metrics.length);
  groups.forEach((g, gi) => {
    let acc = 0; // stacked: running height within the group's single bar
    metrics.forEach((m, mi) => {
      const v = values[gi][mi];
      const h = (H - 2 * pad) * (v / maxV);
      const y0 = stacked ? H - pad - (H - 2 * pad) * (acc / maxV) - h
                         : H - pad - h;
      const rect = svgEl("rect", {
        x: pad + gi * gw + 4 + (stacked ? 0 : mi * bw), y: y0,
        width: Math.max(1, bw - 2), height: Math.max(0, h),
        class: `bar bar-${mi % 6}`,
      });
      if (stacked) acc += v;
      rect.onmousemove = (e) => showTip(e, `<b>${esc(g)}</b><br>${esc(m)}: ${fmt(v)}`);
      rect.onmouseleave = hideTip;
      svg.appendChild(rect);
    });
    const t = svgEl("text", {
      x: pad + gi * gw + gw / 2, y: H - pad + 12, "text-anchor": "middle", class: "tick",
    });
    t.textContent = String(g).slice(0, Math.max(4, Math.floor(gw / 6)));
    svg.appendChild(t);
  });
  metrics.forEach((m, mi) => {
    const lbl = svgEl("text", {
      x: W - pad, y: 16 + 13 * mi, "text-anchor": "end", class: `legend bar-${mi % 6}`,
    });
    lbl.textContent = m;
    svg.appendChild(lbl);
  });
  container.appendChild(svg);
}

function tableChart(container, spec) {
  const cols = spec.columns || [], rows = spec.rows || [];
  if (!rows.length) { container.textContent = "no data"; return; }
  const tbl = document.createElement("table");
  tbl.className = "op-table";
  const thead = document.createElement("thead");
  const hr = document.createElement("tr");
  let sortCol = null, sortDir = -1;
  const tbody = document.createElement("tbody");

  function renderBody(data) {
    tbody.innerHTML = "";
    data.slice(0, 200).forEach((r) => {
      const tr = document.createElement("tr");
      r.forEach((c) => {
        const td = document.createElement("td");
        td.textContent = c == null ? "" : fmt(c);
        tr.appendChild(td);
      });
      tbody.appendChild(tr);
    });
  }

  cols.forEach((c, ci) => {
    const th = document.createElement("th");
    th.textContent = c;
    th.onclick = () => {   // sortable op explorer
      sortDir = sortCol === ci ? -sortDir : -1;
      sortCol = ci;
      const sorted = [...rows].sort((a, b) => {
        const x = a[ci], y = b[ci];
        if (typeof x === "number" && typeof y === "number") return (x - y) * sortDir;
        return String(x).localeCompare(String(y)) * sortDir;
      });
      renderBody(sorted);
      [...hr.children].forEach((h, i) =>
        h.classList.toggle("sorted", i === ci));
    };
    hr.appendChild(th);
  });
  thead.appendChild(hr);
  tbl.appendChild(thead);
  renderBody(rows);
  tbl.appendChild(tbody);

  const filter = document.createElement("input");
  filter.placeholder = "filter ops…";
  filter.className = "op-filter";
  filter.oninput = () => {
    const q = filter.value.toLowerCase();
    renderBody(rows.filter((r) => r.some((c) => String(c).toLowerCase().includes(q))));
  };
  container.appendChild(filter);
  container.appendChild(tbl);
}

const RENDERERS = {
  line: lineChart,
  bar: barChart,
  grouped_bar: groupedBarChart,
  table: tableChart,
};

function renderChart(parent, spec) {
  const card = document.createElement("section");
  card.className = "card";
  const h = document.createElement("h2");
  h.textContent = spec.title || spec.type;
  card.appendChild(h);
  const body = document.createElement("div");
  card.appendChild(body);
  const fn = RENDERERS[spec.type];
  if (fn) fn(body, spec);
  else body.textContent = `unknown chart type: ${spec.type}`;
  parent.appendChild(card);
}

async function loadModel(name) {
  const data = await api(`/api/profile/${name}`);
  const rows = data.results || [];
  document.getElementById("summary-body").innerHTML =
    `<b>${esc(name)}</b>: ${rows.length} entries`;

  const charts = await api(`/api/charts/${name}`);
  const main = document.getElementById("charts");
  main.innerHTML = "";
  charts.forEach((spec) => renderChart(main, spec));

  const recs = await api(`/api/recommendations/${name}`);
  const ul = document.getElementById("recs");
  ul.innerHTML = "";
  recs.forEach((r) => {
    const li = document.createElement("li");
    li.innerHTML = `<b>[P${esc(r.priority)}] ${esc(r.title)}</b> — ${esc(r.estimated_gain)}
      <code>${esc(r.action)}</code>`;
    ul.appendChild(li);
  });
}

async function loadCompare(ids) {
  const box = document.getElementById("compare-body");
  box.innerHTML = "";
  if (ids.length < 2) { box.textContent = "select 2+ result sets"; return; }
  const charts = await api(`/api/compare-charts?ids=${ids.join(",")}`);
  charts.forEach((spec) => renderChart(box, spec));
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

  // comparison view: checkbox per result set
  const cmpSel = document.getElementById("compare-select");
  cmpSel.innerHTML = "";
  models.forEach((m) => {
    const label = document.createElement("label");
    const cb = document.createElement("input");
    cb.type = "checkbox";
    cb.value = m;
    cb.onchange = () =>
      loadCompare([...cmpSel.querySelectorAll("input:checked")].map((c) => c.value));
    label.appendChild(cb);
    label.appendChild(document.createTextNode(m));
    cmpSel.appendChild(label);
  });
  if (models.length > 1) {
    [...cmpSel.querySelectorAll("input")].slice(0, 2).forEach((c) => (c.checked = true));
    loadCompare(models.slice(0, 2));
  }
}

document.getElementById("refresh").onclick = init;
init();
