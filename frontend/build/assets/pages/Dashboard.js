// Dashboard - mirror of pages/Dashboard.tsx: three stat cards (webhook
// count, event count, success rate), a per-webhook activity bar chart, a
// delivery success pie, and the recent-events list.  The reference fills
// the bar chart with Math.random() demo values; this mirror plots the
// real per-path counts from /events instead (same chart, honest data).

import { h, pageHeader, spinner, navigate, fmtDate } from "/assets/ui.js";
import { webhookApi, eventApi } from "/assets/api.js";

function barChart(data) {
  // data: [{name, received, delivered}]
  const W = 640, H = 300, pad = 40;
  const maxV = Math.max(1, ...data.map((d) => Math.max(d.received, d.delivered)));
  const groupW = (W - pad * 2) / Math.max(1, data.length);
  const bw = Math.min(28, groupW / 3);
  const y = (v) => H - pad - ((H - pad * 2) * v) / maxV;
  const parts = [];
  for (let g = 4; g >= 0; g--) {
    const v = (maxV * g) / 4;
    const yy = y(v);
    parts.push(`<line x1="${pad}" y1="${yy}" x2="${W - pad}" y2="${yy}" stroke="#e0e0e0" stroke-dasharray="3 3"/>`);
    parts.push(`<text x="${pad - 6}" y="${yy + 4}" text-anchor="end">${Math.round(v)}</text>`);
  }
  data.forEach((d, i) => {
    const cx = pad + groupW * i + groupW / 2;
    parts.push(`<rect x="${cx - bw - 1}" y="${y(d.received)}" width="${bw}" height="${H - pad - y(d.received)}" fill="#8884d8"><title>${d.name} received: ${d.received}</title></rect>`);
    parts.push(`<rect x="${cx + 1}" y="${y(d.delivered)}" width="${bw}" height="${H - pad - y(d.delivered)}" fill="#82ca9d"><title>${d.name} delivered: ${d.delivered}</title></rect>`);
    parts.push(`<text x="${cx}" y="${H - pad + 14}" text-anchor="middle">${d.name}</text>`);
  });
  parts.push(`<rect x="${pad}" y="${H - 14}" width="10" height="10" fill="#8884d8"/><text x="${pad + 14}" y="${H - 5}">Events Received</text>`);
  parts.push(`<rect x="${pad + 130}" y="${H - 14}" width="10" height="10" fill="#82ca9d"/><text x="${pad + 144}" y="${H - 5}">Events Delivered</text>`);
  const svg = h("div");
  svg.innerHTML = `<svg class="chart" viewBox="0 0 ${W} ${H}" width="100%">${parts.join("")}</svg>`;
  return svg;
}

function pieChart(slices) {
  // slices: [{name, value, color}]
  const total = slices.reduce((a, s) => a + s.value, 0) || 1;
  const R = 80, C = 100;
  let angle = -Math.PI / 2;
  const parts = [];
  for (const s of slices) {
    const frac = s.value / total;
    const a2 = angle + frac * 2 * Math.PI;
    const large = frac > 0.5 ? 1 : 0;
    const x1 = C + R * Math.cos(angle), y1 = C + R * Math.sin(angle);
    const x2 = C + R * Math.cos(a2), y2 = C + R * Math.sin(a2);
    if (frac >= 0.999) {
      parts.push(`<circle cx="${C}" cy="${C}" r="${R}" fill="${s.color}"/>`);
    } else if (frac > 0) {
      parts.push(`<path d="M${C},${C} L${x1},${y1} A${R},${R} 0 ${large} 1 ${x2},${y2} Z" fill="${s.color}"><title>${s.name}: ${(frac * 100).toFixed(0)}%</title></path>`);
    }
    const mid = (angle + a2) / 2;
    if (frac > 0.02) {
      parts.push(`<text x="${C + (R + 18) * Math.cos(mid)}" y="${C + (R + 18) * Math.sin(mid)}" text-anchor="middle">${s.name}: ${(frac * 100).toFixed(0)}%</text>`);
    }
    angle = a2;
  }
  const svg = h("div", { style: "max-width:300px;margin:0 auto" });
  svg.innerHTML = `<svg class="chart" viewBox="0 0 200 200" width="100%">${parts.join("")}</svg>`;
  return svg;
}

export async function Dashboard(main) {
  main.append(pageHeader({ title: "Dashboard" }), spinner());
  let webhooks = [], stats = null, recentEvents = [], allEvents = [];
  try {
    [webhooks, stats, recentEvents, allEvents] = await Promise.all([
      webhookApi.getAll(),
      eventApi.getStats(),
      eventApi.getRecentEvents(5),
      eventApi.getRecentEvents(200),
    ]);
  } catch (e) {
    main.replaceChildren(
      pageHeader({ title: "Dashboard" }),
      h("div", { class: "alert error" }, `Error loading dashboard: ${e.message}`),
    );
    return;
  }

  const perPath = new Map();
  for (const ev of allEvents) {
    const k = ev.source_path || "?";
    const agg = perPath.get(k) || { name: k, received: 0, delivered: 0 };
    agg.received += 1;
    if (ev.success) agg.delivered += 1;
    perPath.set(k, agg);
  }
  const webhookStats = [...perPath.values()].slice(0, 8);
  const successRate = stats?.success_rate || 0;
  const successData = [
    { name: "Success", value: successRate * 100, color: "#0088FE" },
    { name: "Failed", value: (1 - successRate) * 100, color: "#00C49F" },
  ];

  const statCard = (label, value, extra) =>
    h("div", { class: "card" }, h("div", { class: "muted" }, label), h("div", { class: "stat" }, value), extra || "");

  main.replaceChildren(
    pageHeader({ title: "Dashboard" }),
    h(
      "div",
      { class: "grid cols3" },
      statCard(
        "Total Webhooks",
        String(webhooks.length),
        h("button", { class: "btn-outlined", onclick: () => navigate("/webhooks") }, "View All"),
      ),
      statCard("Total Events", String(stats?.received ?? 0), h("div", { class: "muted" }, "Last 24 hours")),
      statCard(
        "Success Rate",
        `${(successRate * 100).toFixed(1)}%`,
        h("div", { class: "muted" }, "Events successfully delivered"),
      ),
    ),
    h(
      "div",
      { class: "grid", style: "grid-template-columns: 2fr 1fr" },
      h("div", { class: "paper" }, h("h3", {}, "Webhook Activity"),
        webhookStats.length ? barChart(webhookStats) : h("p", { class: "muted" }, "No events yet")),
      h("div", { class: "paper" }, h("h3", {}, "Delivery Success Rate"), pieChart(successData)),
    ),
    h(
      "div",
      { class: "paper" },
      h("h3", {}, "Recent Events"),
      h(
        "div",
        { class: "list" },
        recentEvents.length
          ? recentEvents.map((ev) =>
              h(
                "div",
                { class: "item" },
                h(
                  "div",
                  { class: "row-between" },
                  h("span", {}, ev.source_path),
                  h(
                    "span",
                    { style: `color:${ev.success ? "var(--success)" : "var(--error)"}` },
                    ev.success ? "Success" : "Failed",
                  ),
                ),
                h(
                  "div",
                  { class: "row-between muted", style: "font-size:12px" },
                  h("span", {}, `ID: ${String(ev.raw_event_id ?? ev.id).slice(0, 8)}...`),
                  h("span", {}, fmtDate(ev.timestamp)),
                ),
              ),
            )
          : h(
              "div",
              { class: "item" },
              h("div", {}, "No recent events found"),
              h("div", { class: "muted" }, "Webhook events will appear here when received"),
            ),
      ),
      h(
        "div",
        { class: "right", style: "margin-top:12px" },
        h("button", { class: "btn-outlined", onclick: () => navigate("/query") }, "Run Custom Query"),
      ),
    ),
  );
}
